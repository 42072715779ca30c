"""Validate the framework on the reference's REAL recorded mission data.

Every other quality number in this repo comes from synthetic worlds with
random-init backbones.  This tool trains and evaluates on the one piece
of real-world data available under zero egress: the reference's stored
mission graph (`/root/reference/assets/graph/`) — 100 real STEGO
segments from a forest mission with self-supervised footprint labels,
plus the REFERENCE MODEL'S OWN stored predictions on that graph
(trav_pred.pt / reco_pred.pt), giving a direct same-data comparison.

Rows written to results/real_data/real_data_results.{csv,md}:

  reference_stored      AUROC/acc of the reference's stored trav_pred
                        vs its labels y (the number to match/beat)
  tpu_offline_mlp       our SimpleMLP trained by offline/trainer.py on
                        the real features with the real y/y_valid
                        (confidence-weighted self-supervised loss)
  tpu_offline_shuffled  label-shuffle control: same training with
                        permuted labels — must collapse to ~chance,
                        proving the signal comes from the labels
  tpu_online_estimator  the real segments pushed through
                        TraversabilityEstimator's jitted train path
                        (buffer insert -> sample -> fused train step)

Also renders visualizer goldens from the stored reference predictions
(the reference's own demo consumption path, visu/visualizer.py:662-760)
into assets/goldens/reference_graph/.

Usage: python tools/real_data_eval.py [--out results/real_data]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def eval_row(name: str, scores: np.ndarray, labels: np.ndarray, extra=None) -> dict:
    from wild_visual_navigation_tpu.offline.metrics import accuracy, auroc, optimal_threshold

    thr = optimal_threshold(scores, labels)
    row = {
        "model": name,
        "auroc": round(float(auroc(scores, labels)), 4),
        "acc_opt": round(float(accuracy(scores, labels, thr)), 4),
    }
    row.update(extra or {})
    return row


def train_offline(ref, y, y_valid, epochs: int = 60, seed: int = 0):
    """Offline trainer on the real graph, segments-as-samples."""
    from wild_visual_navigation_tpu.offline.dataset import GraphTravDataset
    from wild_visual_navigation_tpu.offline.trainer import OfflineTrainer, OfflineTrainerConfig

    S, D = ref.x.shape
    ds = GraphTravDataset(
        features=ref.x[:, None, :],
        signal=y[:, None].astype(np.float32),
        signal_valid=y_valid[:, None],
        sample_valid=np.ones((S, 1), bool),
    )
    cfg = OfflineTrainerConfig(epochs=epochs, seed=seed)
    cfg.model_cfg["simple_mlp_cfg"]["input_size"] = D
    trainer = OfflineTrainer(cfg)
    trainer.fit(ds)
    import jax.numpy as jnp

    scores = np.asarray(trainer._predict(trainer.params, jnp.asarray(ref.x)))
    return trainer, scores


def train_online(ref, steps: int = 400, nodes: int = 10, seed: int = 0):
    """Push the real segments through TraversabilityEstimator's jitted
    train path: chunk the 100 segments into `nodes` mission nodes
    (fixed permutation so footprint labels spread across nodes), insert
    via add_mission_node, inject the real supervision signal into the
    device ring buffer (this fixture carries no poses, so the
    reprojection stage is bypassed — the signal is exactly what
    reprojection would have produced), then run train()."""
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models import apply_model
    from wild_visual_navigation_tpu.traversability.estimator import TraversabilityEstimator
    from wild_visual_navigation_tpu.traversability.nodes import MissionNode

    S, D = ref.x.shape
    per = S // nodes
    perm = np.random.RandomState(seed).permutation(S)

    est = TraversabilityEstimator(
        model_cfg={
            "name": "SimpleMLP",
            "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True},
        },
        buffer_capacity=nodes,
        num_segments=per,
        feature_dim=D,
        image_height=8,
        image_width=8,
        min_samples_for_training=5,
        batch_size=8,
        seed=seed,
    )

    seg = np.zeros((8, 8), np.int32)
    K = np.eye(3, dtype=np.float32)
    sig = np.zeros((nodes, per), np.float32)
    sigv = np.zeros((nodes, per), bool)
    for i in range(nodes):
        sel = perm[i * per : (i + 1) * per]
        pose = np.eye(4)
        pose[0, 3] = i * 1.0  # spread out past the distance gate
        node = MissionNode(timestamp=float(i), pose_base_in_world=pose)
        ok = est.add_mission_node(node, ref.x[sel], np.ones(per, bool), seg, K)
        assert ok, f"node {i} rejected by the distance gate"
        sig[node.buffer_slot] = ref.y[sel]
        sigv[node.buffer_slot] = ref.y_valid[sel]
        node._has_supervision = True

    with est.lock:
        est._buffer = est._buffer._replace(
            signal=jnp.asarray(sig), signal_valid=jnp.asarray(sigv)
        )

    losses = []
    for _ in range(steps):
        r = est.train()
        if r.get("loss_total", -1) != -1:
            losses.append(r["loss_total"])

    scores = np.asarray(apply_model(est.model, est.params, jnp.asarray(ref.x))[:, 0])
    return est, scores, losses


def render_goldens(ref, folder: str):
    from PIL import Image

    from wild_visual_navigation_tpu.offline.reference_graph import reference_confidence
    from wild_visual_navigation_tpu.visu.visualizer import LearningVisualizer

    os.makedirs(folder, exist_ok=True)
    visu = LearningVisualizer()
    conf = reference_confidence(ref.reco_pred, ref.x)
    renders = {
        "trav_pred_graph": visu.plot_traversability_graph(
            ref.trav_pred, ref.edge_index, ref.centers, ref.img
        ),
        "labels_graph": visu.plot_traversability_graph(
            ref.y, ref.edge_index, ref.centers, ref.img
        ),
        "confidence_graph": visu.plot_traversability_graph(
            conf, ref.edge_index, ref.centers, ref.img
        ),
    }
    for tag, arr in renders.items():
        Image.fromarray((arr * 255).astype(np.uint8)).save(os.path.join(folder, f"{tag}.png"))
    return renders


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="results/real_data")
    ap.add_argument("--goldens", type=str, default="assets/goldens/reference_graph")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--online-steps", type=int, default=400)
    args = ap.parse_args()

    from wild_visual_navigation_tpu.offline.reference_graph import (
        available,
        load_reference_graph,
        reference_confidence,
    )

    if not available():
        print("reference graph assets not found; nothing to do")
        return 1

    ref = load_reference_graph()
    labels = ref.y > 0.5
    print(f"loaded real mission graph: {ref.num_segments} segments x {ref.feature_dim}-dim "
          f"STEGO features, {int(labels.sum())} footprint-labeled, "
          f"{ref.edge_index.shape[1]} adjacency edges, img {ref.img.shape}")

    rows = []

    # 1. The reference model's own stored predictions on this graph.
    conf = reference_confidence(ref.reco_pred, ref.x)
    rows.append(eval_row("reference_stored", ref.trav_pred, labels,
                         {"conf_auroc": round(float(__import__('wild_visual_navigation_tpu.offline.metrics', fromlist=['auroc']).auroc(conf, labels)), 4)}))
    print("reference_stored:", rows[-1])

    # 2. Our offline trainer on the real features + real labels.
    trainer, scores = train_offline(ref, ref.y, ref.y_valid, epochs=args.epochs)
    import jax.numpy as jnp

    our_reco = np.asarray(
        __import__("wild_visual_navigation_tpu.models", fromlist=["apply_model"]).apply_model(
            trainer.model, trainer.params, jnp.asarray(ref.x)
        )[:, 1:]
    )
    our_conf = reference_confidence(our_reco, ref.x)
    from wild_visual_navigation_tpu.offline.metrics import auroc as _auroc

    rows.append(eval_row("tpu_offline_mlp", scores, labels,
                         {"conf_auroc": round(float(_auroc(our_conf, labels)), 4)}))
    print("tpu_offline_mlp:", rows[-1])

    # 3. Label-shuffle control.
    rng = np.random.RandomState(123)
    perm = rng.permutation(ref.num_segments)
    _, shuf_scores = train_offline(ref, ref.y[perm], ref.y_valid[perm], epochs=args.epochs, seed=1)
    rows.append(eval_row("tpu_offline_shuffled", shuf_scores, labels))
    print("tpu_offline_shuffled:", rows[-1])

    # 4. The online estimator's jitted train path.
    est, online_scores, losses = train_online(ref, steps=args.online_steps)
    rows.append(eval_row("tpu_online_estimator", online_scores, labels,
                         {"train_steps": est.step,
                          "loss_first": round(float(losses[0]), 4) if losses else None,
                          "loss_last": round(float(losses[-1]), 4) if losses else None}))
    print("tpu_online_estimator:", rows[-1])

    os.makedirs(args.out, exist_ok=True)
    keys = ["model", "auroc", "acc_opt", "conf_auroc", "train_steps", "loss_first", "loss_last"]
    with open(os.path.join(args.out, "real_data_results.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    with open(os.path.join(args.out, "real_data_results.md"), "w") as f:
        f.write("# Real-mission-data validation\n\n")
        f.write("Data: `/root/reference/assets/graph/` — 100 real STEGO segments from a recorded\n"
                "forest mission with self-supervised footprint labels, plus the reference model's\n"
                "stored predictions on the same graph (its visualizer demo fixture,\n"
                "`visu/visualizer.py:662-760`). All rows score AUROC against the stored labels `y`\n"
                "on the full graph — identical data, identical metric, so `reference_stored` vs the\n"
                "`tpu_*` rows is a direct same-data comparison. `tpu_offline_shuffled` is a\n"
                "label-permutation control (must be ~chance). Regenerate:\n"
                "`python tools/real_data_eval.py`.\n\n")
        f.write("| " + " | ".join(keys) + " |\n")
        f.write("|" + "---|" * len(keys) + "\n")
        for r in rows:
            f.write("| " + " | ".join(str(r.get(k, "—")) for k in keys) + " |\n")

    render_goldens(ref, args.goldens)
    print(f"\nwrote {args.out}/real_data_results.{{csv,md}} and goldens under {args.goldens}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
