"""wild_visual_navigation_tpu — TPU-native self-supervised visual
traversability estimation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
leggedrobotics/wild_visual_navigation (reference mounted read-only at
/root/reference): online self-supervised traversability learning from
camera images + robot proprioception, with a frozen ViT backbone,
per-segment feature pooling, footprint reprojection supervision, and a
confidence-weighted online training loop.

Architecture (vs the reference, see SURVEY.md §7):
  * one process, two jitted programs (inference step + train step)
    sharing a params pytree — replaces the two-ROS-process +
    checkpoint-file hot-swap design;
  * fixed shapes everywhere: padded segments / ring-buffer node stores
    with validity masks — replaces networkx graphs of dynamic tensors;
  * pure-JAX kernels for the reference's CUDA/C dependencies (kornia
    rasterization, fast_slic, liegroups, torch backbones);
  * host side restricted to I/O, scheduling, and buffer bookkeeping.
"""

import os

WVN_ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

__version__ = "0.1.0"
