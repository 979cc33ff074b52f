"""Experiment orchestration: trial runner (tune), analysis, suites."""

from . import tune
from .analysis import ExperimentAnalysis
