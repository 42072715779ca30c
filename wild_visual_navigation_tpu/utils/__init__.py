from . import lie
from .confidence_generator import (
    ConfidenceConfig,
    ConfidenceState,
    confidence_inference,
    confidence_init,
    confidence_load_state_dict,
    confidence_reset,
    confidence_state_dict,
    confidence_update,
)
from .data import NodeData, TravBatch, batch_from_arrays, batch_from_nodes
from .kalman_filter import KalmanFilterParams, KalmanState, kf_init, kf_scan, kf_step
from .loss import (
    AnomalyLossConfig,
    TraversabilityLossConfig,
    anomaly_loss,
    reconstruction_confidence,
    traversability_loss,
)
from .meshes import (
    make_box,
    make_dense_plane,
    make_ellipsoid,
    make_plane,
    make_polygon_from_points,
    make_rounded_box,
    make_side_points,
    make_superquadric,
)
from .operation_modes import WVNMode
