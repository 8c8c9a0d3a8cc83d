from .runner import TASKS, generate_all, qa_summary, write_qa_outputs  # noqa: F401
