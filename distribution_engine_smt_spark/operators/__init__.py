from .merge import (
    additive_merge,
    delete_by_keys,
    delete_by_predicate,
    merge_upsert,
)
from .recursive import expand_tree
from .topk import top_k, keyset_page_by_time, offset_page

__all__ = [
    "merge_upsert",
    "additive_merge",
    "delete_by_keys",
    "delete_by_predicate",
    "expand_tree",
    "top_k",
    "keyset_page_by_time",
    "offset_page",
]
