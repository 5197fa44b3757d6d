from .stoi import stoi, stoi_batch
from .bss import (
    bss_eval_single,
    bss_eval_sources,
    eval_metrics,
    eval_metrics_sources,
)
