from .scalar import (
    epoch_day_of_month,
    epoch_day_of_week,
    epoch_hour,
    epoch_is_weekend,
    json_get,
    null_safe_div,
)
from .exact import davg, dstddev_samp, dsum
from .vector import cosine_similarity, dot, l2_norm, to_double_array

__all__ = [
    "null_safe_div",
    "epoch_hour",
    "epoch_day_of_week",
    "epoch_day_of_month",
    "epoch_is_weekend",
    "json_get",
    "dsum",
    "davg",
    "dstddev_samp",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "to_double_array",
]
