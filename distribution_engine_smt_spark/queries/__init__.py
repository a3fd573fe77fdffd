"""Read-query library over the engine's state tables — the Spark equivalent
of the reference's 17 HTTP endpoints (SURVEY.md §2.11; reference:
server/app.py + engine/post_storage.py query builders).

Every function takes ``(state_tables, **params)`` and returns a DataFrame —
the HTTP/JSON layer is a thin shell over these.
"""

from .discussions import (
    get_discussions_by_blog,
    get_discussions_by_comments,
    get_discussions_by_created,
    get_discussions_by_feed,
    get_discussions_by_replies,
    get_discussions_by_score,
)
from .social import get_follow_count, get_following, get_trending_tags
from .accounts import (
    get_account_history,
    get_account_map,
    get_post_with_votes,
    get_state_lag,
    get_token_config,
)
from .thread import get_thread
from .api_edge import format_discussion_rows, to_json_rows

__all__ = [
    "get_discussions_by_created",
    "get_discussions_by_score",
    "get_discussions_by_blog",
    "get_discussions_by_feed",
    "get_discussions_by_comments",
    "get_discussions_by_replies",
    "get_thread",
    "get_trending_tags",
    "get_following",
    "get_follow_count",
    "get_account_history",
    "get_account_map",
    "get_post_with_votes",
    "get_state_lag",
    "get_token_config",
    "format_discussion_rows",
    "to_json_rows",
]
