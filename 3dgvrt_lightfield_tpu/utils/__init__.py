"""Utilities: metrics, benchmarking, logging."""

from . import benchmark
from . import evaluate
from . import metrics
from . import profiling
from .profiling import FrameTimer, device_sync, trace
from .benchmark import BenchmarkResult, run_benchmark, save_results
from .evaluate import evaluate_dirs, render_eval_set, save_hit_counts
from .metrics import psnr, ssim
