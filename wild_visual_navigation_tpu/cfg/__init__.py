from .experiment import (
    ExperimentParams,
    GeneralParams,
    LossAnomalyParams,
    LossParams,
    ModelParams,
    OptimizerParams,
)
from .node_params import FeatureExtractorNodeParams, LearningNodeParams
