from .runner import TASKS, generate_all, qa_summary  # noqa: F401
