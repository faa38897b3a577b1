"""CLI: dataset downloader (reference
``f3dgs/datasets/download_dataset.py``): fetches + unzips Mip-NeRF 360
captures. Network-gated: raises a clear error in offline environments."""

from __future__ import annotations

import os
import subprocess

DATASETS = {
    "mipnerf360": "http://storage.googleapis.com/gresearch/refraw360/360_v2.zip",
    "mipnerf360_extra": (
        "https://storage.googleapis.com/gresearch/refraw360/360_extra_scenes.zip"
    ),
}


def main(save_dir: str = "./data", dataset: str = "mipnerf360"):
    if dataset not in DATASETS:
        raise ValueError(f"unknown dataset {dataset!r}; options: {list(DATASETS)}")
    url = DATASETS[dataset]
    os.makedirs(save_dir, exist_ok=True)
    zip_path = os.path.join(save_dir, os.path.basename(url))
    try:
        subprocess.run(["wget", "-c", url, "-O", zip_path], check=True)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(
            f"download failed ({e}); this environment may have no network "
            "access — place the extracted dataset under "
            f"{save_dir}/<scene>/ manually."
        )
    subprocess.run(["unzip", "-o", zip_path, "-d", save_dir], check=True)
    print("Extracted to", save_dir)


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
