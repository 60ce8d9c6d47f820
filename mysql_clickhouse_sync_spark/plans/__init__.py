from .registry import Query, register, all_queries, get_query

__all__ = ["Query", "register", "all_queries", "get_query"]
