from .catalog import Query, all_queries

__all__ = ["Query", "all_queries"]
