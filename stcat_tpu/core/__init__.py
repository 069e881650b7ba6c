"""Core runtime: batch pytrees, mesh/sharding setup, logging, metrics."""

from .batch import VideoBatch, VideoTargets

__all__ = ["VideoBatch", "VideoTargets"]
