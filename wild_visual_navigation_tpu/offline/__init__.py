from .dataset import GraphTravDataset
from .loggers import get_logger
from .metrics import accuracy, auroc, optimal_threshold, roc_curve
from .trainer import OfflineTrainer, OfflineTrainerConfig
