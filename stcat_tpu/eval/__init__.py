"""Evaluation: vIoU evaluators and the two-stream evaluation engine."""

from .evaluator import GroundingEvaluator, build_evaluator
from .engine import do_eval

__all__ = ["GroundingEvaluator", "build_evaluator", "do_eval"]
