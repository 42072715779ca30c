"""Image-folder -> graph-dataset generator.

TPU-native equivalent of the reference's dataset-generation surface
(/root/reference/.deprecated/scripts/dataset_generation/):

  * ``create_gnn_dataset.py`` — SLIC superpixels -> per-segment
    backbone features -> STEGO linear-probe semantic labels (majority
    vote inside each superpixel) -> segment adjacency graph, one record
    per image;
  * ``extract_features_for_dataset.py`` — per-frame features plus
    KLT optical-flow correspondences of the segment centers between
    consecutive frames (ops/optical_flow.py, the KLTTrackerOpenCV
    equivalent);
  * ``create_train_val_test_lists.py`` — ``{name}_{train,val,test}.txt``
    split lists: 80 % head -> train, 20 % tail -> val (temporal split,
    the reference's percentage=0.8), every-Nth record -> test
    (every_n_test).

The segments.ai download and rosbag-extraction scripts require external
services/ROS middleware and stay out of scope (SURVEY §2), as does the
Perugia drive layout.

Unlike the reference (one torch .pt per stage folder), each record is a
single ``graph_{i:04d}.npz``: feat (S, D), seg (H, W), edges (2, E) +
edge_valid, centers (S, 2) + center_valid, label (S,) int32 semantic
class (or -1 when --labels none), flow_next (S, 2) + flow_good (S,)
KLT correspondences into the NEXT image (zeros for the last frame).

Usage:
  python tools/generate_dataset.py                       # reference assets
  python tools/generate_dataset.py --images DIR --name my_mission \
      --feature dinov2 --labels stego --size 448
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_images(folder: str, size: int):
    from PIL import Image

    paths = sorted(
        p for p in Path(folder).iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if not paths:
        raise SystemExit(f"no images under {folder}")
    out = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize((size, size), Image.BILINEAR)
        out.append(np.asarray(img, dtype=np.float32).transpose(2, 0, 1) / 255.0)
    return [str(p) for p in paths], out


def majority_labels(seg, linear, n_segments: int, n_classes: int = 27):
    """Per-superpixel majority vote over the STEGO linear-probe classes
    (the reference's 'most often predicted semantic class label',
    create_gnn_dataset.py step 6)."""
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.ops import segment_ops

    onehot = jnp.transpose(
        jnp.eye(n_classes, dtype=jnp.float32)[linear], (2, 0, 1)
    )  # (C, H, W)
    pooled, counts = segment_ops.segment_mean_pool(onehot, seg, n_segments)
    label = jnp.argmax(pooled, axis=-1).astype(jnp.int32)
    return jnp.where(counts > 0, label, -1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=str, default="/root/reference/assets/images")
    ap.add_argument("--name", type=str, default="reference_images")
    ap.add_argument("--out", type=str, default="results/datasets")
    ap.add_argument("--size", type=int, default=448)
    ap.add_argument("--seg", type=str, default="slic")
    ap.add_argument("--feature", type=str, default="dinov2")
    ap.add_argument("--labels", type=str, default="stego", choices=["stego", "none"])
    ap.add_argument("--slic_components", type=int, default=100)
    ap.add_argument("--percentage", type=float, default=0.8,
                    help="head fraction -> train, tail -> val (reference split)")
    ap.add_argument("--every_n_test", type=int, default=2,
                    help="every Nth record also lands in the test list")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.feature_extractor import FeatureExtractor
    from wild_visual_navigation_tpu.ops.optical_flow import track_points

    names, images = load_images(args.images, args.size)
    fe = FeatureExtractor(
        key=jax.random.PRNGKey(0), segmentation_type=args.seg,
        feature_type=args.feature, input_size=args.size,
        slic_num_components=args.slic_components,
    )
    stego = None
    if args.labels == "stego":
        from wild_visual_navigation_tpu.feature_extractor.stego import StegoInterface

        stego = StegoInterface(key=jax.random.PRNGKey(1), input_size=args.size,
                               run_clustering=False)

    base = Path(args.out) / args.name
    os.makedirs(base, exist_ok=True)
    records = []
    extractions = []
    for i, img in enumerate(images):
        ex = fe.extract(jnp.asarray(img)[None])
        S = ex.features.shape[0]
        if stego is not None:
            stego.inference(jnp.asarray(img)[None])
            label = majority_labels(ex.segments, stego.linear_segments[0], S)
        else:
            label = jnp.full((S,), -1, jnp.int32)
        extractions.append((ex, label))

    for i, (ex, label) in enumerate(extractions):
        S = ex.features.shape[0]
        if i + 1 < len(images):
            nxt, good = track_points(
                jnp.asarray(images[i]), jnp.asarray(images[i + 1]), ex.centers
            )
        else:
            nxt = jnp.zeros_like(ex.centers)
            good = jnp.zeros((S,), bool)
        rec = base / f"graph_{i:04d}.npz"
        np.savez_compressed(
            rec,
            source=names[i],
            feat=np.asarray(ex.features, np.float32),
            seg=np.asarray(ex.segments, np.int32),
            edges=np.asarray(ex.edges, np.int32),
            edge_valid=np.asarray(ex.edge_valid, bool),
            centers=np.asarray(ex.centers, np.float32),
            center_valid=np.asarray(ex.center_valid, bool),
            label=np.asarray(label, np.int32),
            flow_next=np.asarray(nxt, np.float32),
            flow_good=np.asarray(good, bool),
        )
        records.append(rec.name)
        print(f"{rec.name}: {names[i]}  S={S} D={ex.features.shape[1]} "
              f"classes={int((np.asarray(label) >= 0).sum())} seg valid", flush=True)

    # --- split lists (create_train_val_test_lists.py semantics) ---
    n_train = int(len(records) * args.percentage)
    splits = {
        "train": records[:n_train],
        "val": records[n_train:],
        "test": records[:: args.every_n_test],
    }
    for mode, items in splits.items():
        with open(base / f"{args.name}_{mode}.txt", "w") as f:
            f.write("\n".join(items) + ("\n" if items else ""))

    meta = {
        "name": args.name, "images": len(records), "size": args.size,
        "seg": args.seg, "feature": args.feature, "labels": args.labels,
        "feature_dim": int(fe.feature_dim),
        "splits": {k: len(v) for k, v in splits.items()},
    }
    with open(base / "meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))
    return 0


if __name__ == "__main__":
    sys.exit(main())
