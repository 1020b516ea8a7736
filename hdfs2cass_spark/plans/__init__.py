from .registry import CATALOG, DeclaredQuery, declare, get_queries, get_oracles

# importing the modules registers their queries
from . import catalog as _catalog  # noqa: E402,F401
from . import llm as _llm  # noqa: E402,F401
from . import pipeline as _pipeline  # noqa: E402,F401
from . import compose as _compose  # noqa: E402,F401

__all__ = ["CATALOG", "DeclaredQuery", "declare", "get_queries", "get_oracles"]
