"""Data-ops CLI: download, flatten, patch, and feature-extract TCGA WSIs.

Native replacement for the reference's invoke-based `tasks.py`
(`/root/reference/tasks.py:14-193`):

    python -m healnet_tpu.cli.tasks install --system linux
    python -m healnet_tpu.cli.tasks download --dataset brca [--samples 10]
    python -m healnet_tpu.cli.tasks flatten --dataset brca
    python -m healnet_tpu.cli.tasks preprocess --dataset brca --step patch
    python -m healnet_tpu.cli.tasks preprocess --dataset brca --step features

Differences from the reference, by design:
- the patching step (`tasks.py:130-132` shells out to a cloned CLAM repo) is
  re-implemented natively: Otsu tissue segmentation on a low-resolution
  level via OpenCV, then a regular grid of tissue patches at the target
  level, coordinates written to the same ``patches/<slide_id>.h5`` schema
  CLAM produces (dataset ``coords``);
- feature extraction (`tasks.py:134-192`) runs the Flax ResNet-50 on TPU in
  batches (device-side patch embedding) and writes ``.npy`` feature files
  next to the reference-compatible layout; pass ``--weights`` to use a local
  torchvision resnet50 checkpoint.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

from healnet_tpu.utils import Config

GDC_URLS = {
    "linux": "https://gdc.cancer.gov/files/public/file/gdc-client_v1.6.1_Ubuntu_x64.zip",
    "mac": "https://gdc.cancer.gov/files/public/file/gdc-client_v1.6.1_OSX_x64.zip",
}
from healnet_tpu.constants import VALID_DATASETS


def install(system: str) -> None:
    """Fetch the gdc-client download binary (`tasks.py:14-29`)."""
    assert system in GDC_URLS, "system must be 'linux' or 'mac'"
    url = GDC_URLS[system]
    print(f"Installing gdc-client for {system}...")
    subprocess.run(["curl", "-L", url, "--output", "gdc-client.zip"], check=True)
    subprocess.run(["unzip", "-o", "gdc-client.zip"], check=True)
    os.remove("gdc-client.zip")
    print(f"Installed gdc-client at {os.getcwd()}")


def download(
    dataset: str, config_path: str = "config/main.yml", samples: Optional[int] = None
) -> None:
    """gdc-client download against the filtered manifest (`tasks.py:31-65`)."""
    import pandas as pd

    assert dataset in VALID_DATASETS, f"dataset must be one of {VALID_DATASETS}"
    conf = Config(config_path).read()
    download_dir = Path(conf["tcga_path"]) / "wsi" / dataset
    download_dir.mkdir(parents=True, exist_ok=True)
    manifest_path = Path(
        f"data/tcga/gdc_manifests/filtered/{dataset}_wsi_manifest_filtered.txt"
    )
    if samples is not None:
        manifest = pd.read_csv(manifest_path, sep="\t").sample(
            n=int(samples), random_state=42
        )
        tmp = manifest_path.parent / f"{dataset}_tmp.txt"
        manifest.to_csv(tmp, sep="\t", index=False)
        manifest_path = tmp
    try:
        subprocess.run(
            [str(conf["gdc_client"]), "download", "-m", str(manifest_path),
             "-d", str(download_dir)],
            check=True,
        )
    finally:
        if samples is not None:
            manifest_path.unlink(missing_ok=True)


def flatten(dataset: str, config_path: str = "config/main.yml") -> None:
    """Move .svs files out of per-file gdc directories (`tasks.py:67-84`)."""
    conf = Config(config_path).read()
    wsi_dir = Path(conf["tcga_path"]) / "wsi" / dataset
    moved = 0
    for svs in list(wsi_dir.glob("*/*.svs")):
        target = wsi_dir / svs.name
        if not target.exists():
            shutil.move(str(svs), str(target))
            moved += 1
        if svs.parent != wsi_dir and not any(svs.parent.iterdir()):
            svs.parent.rmdir()
    print(f"Flattened {moved} slides into {wsi_dir}")


# ---------------------------------------------------------------- patching

def segment_tissue(thumbnail: np.ndarray, close_kernel: int = 7) -> np.ndarray:
    """Otsu tissue mask on a low-res RGB thumbnail (CLAM-style segmentation)."""
    import cv2

    hsv = cv2.cvtColor(thumbnail, cv2.COLOR_RGB2HSV)
    saturation = hsv[:, :, 1]
    blur = cv2.medianBlur(saturation, 7)
    _, mask = cv2.threshold(blur, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    kernel = np.ones((close_kernel, close_kernel), np.uint8)
    mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
    return mask > 0


def patch_slide(
    slide,
    level: int,
    patch_size: int = 256,
    step: Optional[int] = None,
    tissue_threshold: float = 0.25,
    thumb_max: int = 1024,
) -> np.ndarray:
    """Grid tissue-patch coordinates (level-0 space, CLAM h5 convention)."""
    step = step or patch_size
    level = min(level, slide.level_count - 1)
    w, h = slide.level_dimensions[level]
    w0, h0 = slide.dimensions
    # per-axis scales: level dimensions are floored independently per axis,
    # so sharing the x scale would drift the y origin by tens of level-0
    # pixels near the bottom of a deep-pyramid slide
    scale_x = w0 / w  # level -> level0
    scale_y = h0 / h

    # tissue mask from the most downsampled level, resized to a thumbnail
    thumb_level = slide.level_count - 1
    tw, th = slide.level_dimensions[thumb_level]
    shrink = max(1, int(max(tw, th) / thumb_max))
    thumb = slide.read_region((0, 0), thumb_level, (tw, th))[:, :, :3]
    thumb = thumb[::shrink, ::shrink]
    mask = segment_tissue(thumb)

    mask_h, mask_w = mask.shape
    coords: List[List[int]] = []
    for y in range(0, h - patch_size + 1, step):
        for x in range(0, w - patch_size + 1, step):
            # map patch centre into mask space
            cx = int((x + patch_size / 2) / w * mask_w)
            cy = int((y + patch_size / 2) / h * mask_h)
            y0m = max(cy - 2, 0)
            x0m = max(cx - 2, 0)
            window = mask[y0m : cy + 3, x0m : cx + 3]
            if window.size and window.mean() >= tissue_threshold:
                coords.append([int(x * scale_x), int(y * scale_y)])
    return np.asarray(coords, dtype=np.int64).reshape(-1, 2)


def preprocess(
    dataset: str,
    config_path: str = "config/main.yml",
    level: int = 2,
    step: str = "patch",
    patch_size: int = 256,
    max_patches: Optional[int] = None,
    weights: Optional[str] = None,
    save_format: str = "npy",
) -> None:
    """Patch or feature-extract all slides of a dataset (`tasks.py:86-192`)."""
    from healnet_tpu.etl.slides import OpenSlide

    conf = Config(config_path).read()
    raw_dir = Path(conf["tcga_path"]) / "wsi" / dataset
    prep = Path(conf["tcga_path"]) / "wsi" / f"{dataset}_preprocessed_level{level}"
    (prep / "patches").mkdir(parents=True, exist_ok=True)
    (prep / "patch_features").mkdir(parents=True, exist_ok=True)
    slides = sorted(raw_dir.glob("**/*.svs"))
    print(f"{len(slides)} slides found in {raw_dir}")

    if step == "patch":
        import h5py

        for path in slides:
            slide = OpenSlide(path)
            if slide.level_count - 1 < level:
                print(f"skipping {path.name}: no pyramid level {level}")
                continue
            coords = patch_slide(slide, level=level, patch_size=patch_size)
            with h5py.File(prep / "patches" / f"{path.stem}.h5", "w") as f:
                dset = f.create_dataset("coords", data=coords)
                dset.attrs["patch_size"] = patch_size
                dset.attrs["patch_level"] = level
            print(f"{path.stem}: {len(coords)} tissue patches")
            slide.close()
        return

    if step == "features":
        import h5py

        from healnet_tpu.ops.resnet import PatchFeatureExtractor

        extractor = PatchFeatureExtractor(weights_path=weights)
        if not extractor.pretrained:
            print(
                "WARNING: no --weights provided; extracting with randomly "
                "initialised ResNet-50 (fixed random projections)."
            )
        import cv2

        done = skipped_missing = resumed = 0
        for path in slides:
            h5_path = prep / "patches" / f"{path.stem}.h5"
            if not h5_path.exists():
                skipped_missing += 1
                continue
            out = prep / "patch_features" / f"{path.stem}.{save_format}"
            if out.exists():
                resumed += 1  # interrupted runs restart where they stopped
                continue
            with h5py.File(h5_path, "r") as f:
                coords = f["coords"][:]
                # the grid geometry lives in the h5 attrs written at patch
                # time — trust those over the CLI flags, or cropped regions
                # silently cover the wrong area on a mismatch
                attrs = dict(f["coords"].attrs)
            # per-slide geometry: never mutate the CLI flags, or one slide's
            # attrs would leak into every later slide that lacks attrs
            ps = int(attrs.get("patch_size", patch_size))
            lv = int(attrs.get("patch_level", level))
            if ps != patch_size:
                print(
                    f"{path.stem}: using patch_size {ps} "
                    f"from the patches h5 (CLI said {patch_size})"
                )
            if lv != level:
                print(
                    f"{path.stem}: using level {lv} "
                    f"from the patches h5 (CLI said {level})"
                )
            if max_patches is not None:
                coords = coords[:max_patches]
            slide = OpenSlide(path)
            patches = np.zeros((len(coords), 224, 224, 3), np.uint8)
            for i, (x0, y0) in enumerate(coords):
                region = slide.read_region(
                    (int(x0), int(y0)), min(lv, slide.level_count - 1),
                    (ps, ps),
                )[:, :, :3]
                patches[i] = cv2.resize(region, (224, 224))
            features = extractor(patches)  # (n, 2048) on TPU
            if max_patches is not None and len(features) < max_patches:
                features = np.pad(
                    features, ((0, max_patches - len(features)), (0, 0))
                )
            if save_format == "npy":
                np.save(out, features)
            else:
                import torch

                torch.save(torch.tensor(features), out)
            print(f"{path.stem}: {features.shape} features -> {out}")
            slide.close()
            done += 1
        print(
            f"features: {done} extracted, {resumed} already present, "
            f"{skipped_missing} without a patches h5"
        )
        if done == 0 and resumed == 0 and skipped_missing > 0:
            print(
                "WARNING: no slide had a patches h5 under "
                f"{prep / 'patches'} — did you run --step patch at the same "
                "--level?"
            )
        return

    raise ValueError("step must be 'patch' or 'features'")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="healnet_tpu data-ops")
    sub = parser.add_subparsers(dest="task", required=True)

    p = sub.add_parser("install")
    p.add_argument("--system", default="linux", choices=["linux", "mac"])

    p = sub.add_parser("download")
    p.add_argument("--dataset", required=True)
    p.add_argument("--config", default="config/main.yml")
    p.add_argument("--samples", type=int, default=None)

    p = sub.add_parser("flatten")
    p.add_argument("--dataset", required=True)
    p.add_argument("--config", default="config/main.yml")

    p = sub.add_parser("preprocess")
    p.add_argument("--dataset", required=True)
    p.add_argument("--config", default="config/main.yml")
    p.add_argument("--level", type=int, default=2)
    p.add_argument("--step", default="patch", choices=["patch", "features"])
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--max_patches", type=int, default=None)
    p.add_argument("--weights", default=None, help="local torchvision resnet50 .pt")
    p.add_argument("--save_format", default="npy", choices=["npy", "pt"])

    args = parser.parse_args(argv)
    if args.task == "install":
        install(args.system)
    elif args.task == "download":
        download(args.dataset, args.config, args.samples)
    elif args.task == "flatten":
        flatten(args.dataset, args.config)
    elif args.task == "preprocess":
        preprocess(
            args.dataset, args.config, args.level, args.step,
            args.patch_size, args.max_patches, args.weights, args.save_format,
        )


if __name__ == "__main__":
    main()
