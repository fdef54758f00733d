from .trainer import SeggerTrainer, TrainConfig

__all__ = ["SeggerTrainer", "TrainConfig"]
