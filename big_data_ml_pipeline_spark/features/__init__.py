from .pipeline import build_feature_pipeline
from .engineering import FeatureEngineer

__all__ = ["build_feature_pipeline", "FeatureEngineer"]
