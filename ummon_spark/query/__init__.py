from .parser import parse_query
from .executor import execute_query

__all__ = ["parse_query", "execute_query"]
