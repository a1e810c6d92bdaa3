from .assignment import max_weight_assignment_total  # noqa: F401
from .retrieval import bm25_topk  # noqa: F401
from .unionfind import UnionFind  # noqa: F401
