"""Utilities: metrics, benchmarking, logging."""

from . import metrics
from .metrics import psnr, ssim
