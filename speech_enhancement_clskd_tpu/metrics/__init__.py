from .stoi import stoi, stoi_batch
from .bss import bss_eval_single, eval_metrics
