from .models import MODEL_REGISTRY, build_estimator
from .quality import (
    fit_quality_classifier,
    quality_classifier_scores,
    quality_feature_table,
    score_quality,
)

__all__ = [
    "build_estimator",
    "MODEL_REGISTRY",
    "fit_quality_classifier",
    "score_quality",
    "quality_classifier_scores",
    "quality_feature_table",
]
