from .pipeline import build_feature_pipeline
from .engineering import FeatureEngineer
from . import transformers

__all__ = ["build_feature_pipeline", "FeatureEngineer", "transformers"]
