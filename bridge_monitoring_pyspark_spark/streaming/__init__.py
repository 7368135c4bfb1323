from .jobs import run_bronze, run_gold, run_silver

__all__ = ["run_bronze", "run_silver", "run_gold"]
