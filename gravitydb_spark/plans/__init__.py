from .compiler import QueryResult, execute

__all__ = ["QueryResult", "execute"]
