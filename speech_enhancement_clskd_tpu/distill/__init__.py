from .abf import ABF, ReviewKD
from .strategies import STRATEGIES, distill_loss
