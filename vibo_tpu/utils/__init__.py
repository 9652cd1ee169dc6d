"""Utilities: metrics/JSONL logging, timing, seeding, config plumbing."""

from vibo_tpu.utils.metrics import AverageMeter, MetricsLogger, Timer  # noqa: F401
