"""SSL pipeline orchestrator.

Rebuild of classifier/main_ssl_pipeline.py:93-318:
discover dataset/{DBII,Nist} → train (or load) the SSL model → extract
embeddings (npz cache) → KMeans clustering + JSON report → per-ID mean
aggregation keyed {DBII|NIST}_{id} → ID→cluster via nearest-to-centroid
sample → write id_clusters.csv (schema filename,path,global_id,cluster_label,
main_ssl_pipeline.py:294-307).
"""

from __future__ import annotations

import csv
import json
from collections import defaultdict
from pathlib import Path

import numpy as np
import jax

from ..config import load_classifier_config
from ..clustering import (agglomerative_fast, evaluate_clustering, kmeans,
                          pca_reduce)
from ..models.ssl_model import SSLModel
from ..train.ssl_train import train_ssl, load_checkpoint, init_ssl_state
from ..utils.logging import console_step, get_file_logger
from .data import collect_image_paths, two_view_batches, global_id_for
from .embeddings import extract_embeddings

logger = get_file_logger(__name__, "data/metadata/train.log")


def build_model(cfg) -> SSLModel:
    m = cfg.ssl.model
    return SSLModel(
        backbone_name=m.get("backbone", "effnetv2_s"),
        embedding_dim=m.get("embedding_dim", 756),
        proj_hidden_dim=m.get("projection_hidden_dim", 512),
        proj_output_dim=m.get("projection_dim", 256),
        proj_num_layers=m.get("projection_layers", 2),
        use_predictor=m.get("use_predictor", True),
    )


def main(config_path: str | None = None, dataset_dirs=None,
         train: bool = True, mesh=None) -> dict:
    cfg = load_classifier_config(config_path)
    save_dir = Path(cfg.paths.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    # --- discover dataset (main_ssl_pipeline.py:105-116) ---
    if dataset_dirs is None:
        base = Path(cfg.paths.dataset_dir)
        dataset_dirs = [d for d in (base / "DBII", base / "Nist") if d.exists()]
        if not dataset_dirs:
            dataset_dirs = [base]
    paths = collect_image_paths(dataset_dirs)
    if not paths:
        raise FileNotFoundError(f"no images under {dataset_dirs}")
    console_step(f"SSL pipeline: {len(paths)} images")

    model = build_model(cfg)
    tcfg = cfg.ssl.training
    dcfg = cfg.ssl.dataset
    image_size = dcfg.get("image_size", 224)
    batch_size = dcfg.get("batch_size", 16)

    # --- train or load (main_ssl_pipeline.py:131-167) ---
    final_ckpt = save_dir / "ssl_model_final.msgpack"
    import optax
    dummy_tx = optax.identity()
    state = init_ssl_state(model, jax.random.PRNGKey(dcfg.get("seed", 42)),
                           (image_size, image_size), dummy_tx)
    if final_ckpt.exists():
        console_step("Loading existing SSL checkpoint")
        payload = load_checkpoint(final_ckpt, {
            "params": state.params, "batch_stats": state.batch_stats, "step": 0})
        variables = {"params": payload["params"],
                     "batch_stats": payload["batch_stats"]}
    elif train:
        # TPU-native option (ssl.training.device_augment): the uint8
        # dataset lives in HBM and both contrastive views render inside
        # the jit step (classifier.augment_device) — no per-epoch
        # host->device view traffic (the host path ships ~2*N*224^2*4
        # bytes per epoch through the relay). Requires uniform image
        # shapes; falls back to host two_view_batches otherwise.
        device_data = None
        if tcfg.get("device_augment", False) and mesh is None:
            import cv2
            imgs = [cv2.imread(str(p), cv2.IMREAD_GRAYSCALE) for p in paths]
            if (all(im is not None for im in imgs)
                    and len({im.shape for im in imgs}) == 1):
                device_data = np.stack(imgs)
            else:
                console_step("device_augment requested but image shapes "
                             "differ; using host augmentation")
        if device_data is not None:
            console_step("Training SSL model (device-resident augmentation)")
            from ..train.ssl_train import train_ssl_device
            state, _ = train_ssl_device(
                model, device_data, batch_size,
                epochs=tcfg.get("epochs", 3),
                lr=tcfg.get("lr", 1e-5),
                weight_decay=tcfg.get("weight_decay", 1e-5),
                grad_clip=tcfg.get("grad_clip", 1.0),
                warmup_epochs=tcfg.get("warmup_epochs", 5),
                temperature=tcfg.get("temperature", 0.5),
                image_size=image_size,
                seed=dcfg.get("seed", 42), save_dir=save_dir,
                save_every=tcfg.get("save_every", 30),
                early_stop_patience=tcfg.get("early_stop_patience", 15),
            )
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
        else:
            console_step("Training SSL model")
            steps_per_epoch = max(1, len(paths) // batch_size)
            seed = dcfg.get("seed", 42)

            def batches(epoch_counter=[0]):
                epoch_counter[0] += 1
                return two_view_batches(paths, batch_size, image_size,
                                        seed=seed + epoch_counter[0])

            state, _ = train_ssl(
                model, batches, steps_per_epoch,
                epochs=tcfg.get("epochs", 3),
                lr=tcfg.get("lr", 1e-5),
                weight_decay=tcfg.get("weight_decay", 1e-5),
                grad_clip=tcfg.get("grad_clip", 1.0),
                warmup_epochs=tcfg.get("warmup_epochs", 5),
                temperature=tcfg.get("temperature", 0.5),
                input_shape=(image_size, image_size),
                seed=seed, save_dir=save_dir,
                save_every=tcfg.get("save_every", 30),
                early_stop_patience=tcfg.get("early_stop_patience", 15),
                mesh=mesh,
            )
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
    else:
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    # --- embeddings (main_ssl_pipeline.py:172-182) ---
    console_step("Extracting embeddings")
    # extraction resolution must match training (a hard-coded 256 here
    # degraded embeddings whenever dataset.image_size differed)
    embeddings, kept_paths = extract_embeddings(
        model, variables, paths, batch_size=batch_size,
        image_size=image_size, cache_file=save_dir / "embeddings.npz")
    print(f"embeddings: {embeddings.shape}")

    # --- clustering (main_ssl_pipeline.py:190-214) ---
    console_step("Clustering")
    ccfg = cfg.ssl.clustering
    n_clusters = ccfg.get("n_clusters", 8)
    x = embeddings
    pca_dim = ccfg.get("pca_dim", 100)
    if pca_dim and x.shape[1] > pca_dim and x.shape[0] > pca_dim:
        x, _, _ = pca_reduce(x, pca_dim)
        x = np.asarray(x)
    # method selection mirrors cluster_embeddings.py:105-161's agglomerative
    # option; "agglomerative" = the two-stage path (kmeans to <=512 centers,
    # cosine average-linkage merge) which resists the single-giant-cluster
    # collapse kmeans shows on weak embeddings
    method = ccfg.get("method", "kmeans")
    if method == "agglomerative":
        labels = agglomerative_fast(
            jax.random.PRNGKey(dcfg.get("seed", 42)), x, n_clusters)
        inertia = None
    else:
        labels, centers, inertia = kmeans(
            jax.random.PRNGKey(dcfg.get("seed", 42)), x, n_clusters)
        inertia = float(inertia)
    labels = np.asarray(labels)
    report = evaluate_clustering(x, labels, n_clusters)
    report["inertia"] = inertia
    report["method"] = method
    with open(save_dir / "clustering_report_detailed.json", "w") as f:
        json.dump(report, f, indent=2)

    # Embedding scatter figure (main_ssl_pipeline.py:219-243).
    vcfg = cfg.get("ssl.visualization", {})
    try:
        from .visualize import visualize_embeddings
        figures_dir = Path(cfg.get("paths.figures_dir", "results/img"))
        visualize_embeddings(
            embeddings, labels, figures_dir / "embeddings_clusters.png",
            method=vcfg.get("method", "tsne") if hasattr(vcfg, "get") else "tsne",
            max_points=vcfg.get("max_points", 3000) if hasattr(vcfg, "get") else 3000)
    except Exception as e:  # viz must never break the pipeline
        logger.warning("embedding visualization failed: %s", e)

    # --- per-ID aggregation + nearest-to-centroid label
    #     (main_ssl_pipeline.py:250-289) ---
    console_step("Per-ID aggregation")
    id_to_embeddings = defaultdict(list)
    id_to_filenames = defaultdict(list)
    for emb, fname in zip(embeddings, kept_paths):
        gid = global_id_for(fname)
        id_to_embeddings[gid].append(emb)
        id_to_filenames[gid].append(fname)

    id_list = list(id_to_embeddings)
    id_labels = []
    for gid in id_list:
        mean_emb = np.mean(np.stack(id_to_embeddings[gid]), axis=0)
        dists = np.linalg.norm(embeddings - mean_emb, axis=1)
        id_labels.append(int(labels[int(np.argmin(dists))]))

    # --- id_clusters.csv (main_ssl_pipeline.py:294-307) ---
    csv_path = save_dir / "id_clusters.csv"
    with open(csv_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["filename", "path", "global_id", "cluster_label"])
        for gid, cl in zip(id_list, id_labels):
            for full in id_to_filenames[gid]:
                writer.writerow([Path(full).name, full, gid, cl])
    console_step(f"id_clusters.csv written: {len(id_list)} ids")

    return {
        "num_images": len(kept_paths),
        "num_ids": len(id_list),
        "embeddings": embeddings,
        "labels": labels,
        "clustering_report": report,
        "csv_path": str(csv_path),
    }


if __name__ == "__main__":
    main()
