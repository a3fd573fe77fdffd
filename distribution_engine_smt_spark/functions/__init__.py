from .scoring import (
    convergent_linear,
    convergent_square_root,
    int_pow,
    int_sqrt,
    score,
    SCORE_TIMESCALE_HOT,
    SCORE_TIMESCALE_TREND,
)
from .text import (
    construct_authorperm,
    resolve_author,
    resolve_permlink,
    build_tags_csv,
    truncate,
    is_main_post,
    reblogged_by_first,
    tags_array,
    memo_to_authorperm,
)
from .json_utils import tolerant_json_map, extract_user, json_str_field
from .timeutils import add_days, epoch_seconds, format_time, within_last_days

__all__ = [
    "score",
    "SCORE_TIMESCALE_TREND",
    "SCORE_TIMESCALE_HOT",
    "convergent_linear",
    "convergent_square_root",
    "int_sqrt",
    "int_pow",
    "construct_authorperm",
    "resolve_author",
    "resolve_permlink",
    "build_tags_csv",
    "truncate",
    "is_main_post",
    "reblogged_by_first",
    "tags_array",
    "memo_to_authorperm",
    "tolerant_json_map",
    "extract_user",
    "json_str_field",
    "add_days",
    "epoch_seconds",
    "format_time",
    "within_last_days",
]
