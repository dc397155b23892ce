"""Host ingest benchmark: loader -> device batches per second.

Fabricates DSEC-scale data (real events.h5 with ~1e5-event windows,
rectify map, 480x640 PNGs), then measures the full host path the TPU
consumes during training: PNG decode + crop/flip/resize + ISR + events.h5
slice + voxel grid + norm, through the PrefetchLoader, ending in
jax.device_put (VERDICT r1 item 7: prove host rate >= 2x device
consumption, currently ~3 samples/s/chip).

Usage: python tools/bench_ingest.py [--samples 64] [--workers 4]
                                    [--events-per-window 120000]
Prints one JSON line with samples/s for the loader alone and loader+H2D.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate_dsec(root: str, n_frames: int, events_per_window: int) -> str:
    import h5py
    seq = os.path.join(root, "zurich_city_09_x")
    img_dir = os.path.join(seq, "images", "left", "rectified")
    warp_dir = os.path.join(seq, "warp_images")
    ev_dir = os.path.join(seq, "events", "left")
    for d in (img_dir, warp_dir, ev_dir):
        os.makedirs(d, exist_ok=True)
    g = np.random.default_rng(0)
    n_events = events_per_window * n_frames
    with h5py.File(os.path.join(ev_dir, "events.h5"), "w") as f:
        # chunked + gzip mirrors the real files' compressed chunk streams
        f.create_dataset("events/t", data=np.sort(
            g.integers(0, 10 ** 8, n_events)).astype(np.int64),
            chunks=(65536,), compression="gzip", compression_opts=1)
        f.create_dataset("events/x", data=g.integers(
            0, 640, n_events).astype(np.uint16), chunks=(65536,),
            compression="gzip", compression_opts=1)
        f.create_dataset("events/y", data=g.integers(
            0, 480, n_events).astype(np.uint16), chunks=(65536,),
            compression="gzip", compression_opts=1)
        f.create_dataset("events/p", data=g.integers(
            0, 2, n_events).astype(np.uint8), chunks=(65536,),
            compression="gzip", compression_opts=1)
    with h5py.File(os.path.join(ev_dir, "rectify_map.h5"), "w") as f:
        yy, xx = np.mgrid[0:480, 0:640]
        f["rectify_map"] = np.stack([xx, yy], -1).astype(np.float32)
    for i in range(n_frames):
        arr = g.integers(0, 255, (480, 640, 3), np.uint8).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i:06d}.png"))
        Image.fromarray(arr).save(os.path.join(warp_dir, f"{i:06d}.png"))
    np.savetxt(os.path.join(seq, "images", "images_to_events_index.txt"),
               np.arange(1, n_frames + 1) * events_per_window - 1, fmt="%d")
    txt = os.path.join(root, "night_dataset_warp.txt")
    rows = [f"{img_dir}/{i:06d}.png 0" for i in range(1, n_frames)]
    with open(txt, "w") as f:
        f.write("\n".join(rows))
    return txt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--events-per-window", type=int, default=120000)
    ap.add_argument("--no-native", action="store_true")
    args = ap.parse_args()

    from cmda_tpu.config import IsrParams
    from cmda_tpu.data.dsec import DSECDataset
    from cmda_tpu.data.loader import PrefetchLoader, device_put_batch
    from cmda_tpu import native

    if args.no_native:
        native._LIB = None  # force the pure-Python path
        native.available = lambda: False

    with tempfile.TemporaryDirectory() as tmp:
        txt = fabricate_dsec(tmp, args.frames, args.events_per_window)
        ds = DSECDataset(txt, events_bins=1, crop_size=(400, 400),
                         after_crop_resize_size=(512, 512),
                         isr_params=IsrParams(),
                         outputs=("image", "events", "isr"))
        loader = PrefetchLoader(ds, args.batch_size,
                                num_workers=args.workers, prefetch=4)
        # warm: first batches pay h5 open + page cache
        for _ in range(2):
            next(loader)
        n_batches = max(args.samples // args.batch_size, 1)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(loader)
        dt_loader = time.perf_counter() - t0

        t0 = time.perf_counter()
        import jax
        for _ in range(n_batches):
            batch = next(loader)
            batch = device_put_batch(batch)
        jax.block_until_ready(batch)
        dt_h2d = time.perf_counter() - t0
        loader.close()

    n = n_batches * args.batch_size
    print(json.dumps({
        "metric": "dsec_ingest_samples_per_sec",
        "loader_sps": round(n / dt_loader, 2),
        "loader_h2d_sps": round(n / dt_h2d, 2),
        "native": native.available(),
        "workers": args.workers,
        "events_per_window": args.events_per_window,
    }), flush=True)
    # skip interpreter teardown: the experimental TPU client can hang at
    # exit with live loader threads (observed on the axon backend)
    os._exit(0)


if __name__ == "__main__":
    main()
