from .linear_rnvp import LinearRnvp
from .registry import get_model
from .simple_gcn import SimpleGCN, gcn_aggregate
from .simple_mlp import DoubleMLP, SimpleMLP
