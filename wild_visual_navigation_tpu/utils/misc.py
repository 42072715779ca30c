"""Misc utilities: experiment folders, dict flattening, confidence
normalization, test fixtures.

Replaces /root/reference/wild_visual_navigation/utils/
{create_experiment_folder,flatten_dict,get_confidence,testing}.py.
"""

from __future__ import annotations

import datetime
import os
from typing import Optional

import numpy as np

from .. import WVN_ROOT_DIR


def create_experiment_folder(name: str = "debug/debug", timestamp: bool = True, root: Optional[str] = None) -> str:
    """Timestamped mission/experiment folder (reference
    create_experiment_folder.py:16-47)."""
    root = root or os.path.join(WVN_ROOT_DIR, "results")
    if timestamp:
        stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        path = os.path.join(root, name, stamp)
    else:
        path = os.path.join(root, name)
    os.makedirs(path, exist_ok=True)
    return path


def flatten_dict(d: dict, parent_key: str = "", sep: str = "_") -> dict:
    """reference flatten_dict.py."""
    items = []
    for k, v in d.items():
        new_key = f"{parent_key}{sep}{k}" if parent_key else str(k)
        if isinstance(v, dict):
            items.extend(flatten_dict(v, new_key, sep=sep).items())
        else:
            items.append((new_key, v))
    return dict(items)


def get_confidence(x: np.ndarray) -> np.ndarray:
    """Min-max normalized confidence (reference get_confidence.py:10-14)."""
    x = np.asarray(x, dtype=np.float32)
    lo, hi = x.min(), x.max()
    if hi - lo < 1e-12:
        return np.zeros_like(x)
    return (x - lo) / (hi - lo)


# ------------------------------------------------------------- fixtures

TEST_IMAGE_PATH = "/root/reference/assets/images/forest_clean.png"


def load_test_image(path: str = TEST_IMAGE_PATH):
    """(1, 3, H, W) float in [0,1] — the reference's standard fixture
    (utils/testing.py:13-33). Falls back to a synthetic image when the
    asset isn't mounted."""
    import jax.numpy as jnp

    try:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
        return jnp.asarray(img).transpose(2, 0, 1)[None]
    except Exception:
        rng = np.random.RandomState(0)
        img = rng.rand(3, 224, 224).astype(np.float32)
        return jnp.asarray(img)[None]


def make_results_folder(name: str) -> str:
    path = os.path.join(WVN_ROOT_DIR, "results", name)
    os.makedirs(path, exist_ok=True)
    return path
