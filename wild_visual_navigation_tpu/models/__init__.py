from .linear_rnvp import LinearRnvp
from .registry import apply_model, get_model, init_model, model_needs_edges
from .simple_gcn import SimpleGCN, gcn_aggregate
from .simple_mlp import DoubleMLP, SimpleMLP
