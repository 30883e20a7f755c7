from .projection import (
    interaction_features,
    ratio_features,
    time_features,
    time_features_native,
    with_columns,
)
from .aggregates import freq_counts, global_stats, grouped_stats, target_means
from .joins import broadcast_join, join_back
from .windows import (
    gap_fill_resample,
    lag_features,
    rolling_features,
    top_k_per_group,
)
from .setops import random_split

__all__ = [
    "with_columns",
    "ratio_features",
    "interaction_features",
    "time_features",
    "time_features_native",
    "grouped_stats",
    "freq_counts",
    "target_means",
    "global_stats",
    "join_back",
    "broadcast_join",
    "lag_features",
    "rolling_features",
    "top_k_per_group",
    "gap_fill_resample",
    "random_split",
]
