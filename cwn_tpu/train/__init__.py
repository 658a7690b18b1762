"""Experiment harness: loaders, trainer, evaluator, schedulers, CLI."""

from cwn_tpu.train.evaluator import Evaluator
from cwn_tpu.train.loader import ComplexLoader
from cwn_tpu.train.trainer import Trainer, TrainConfig
