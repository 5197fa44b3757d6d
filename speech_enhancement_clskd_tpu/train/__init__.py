from .trainer import Trainer, TrainState
