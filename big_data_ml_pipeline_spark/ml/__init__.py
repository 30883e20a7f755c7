from .models import build_estimator, MODEL_REGISTRY

__all__ = ["build_estimator", "MODEL_REGISTRY"]
