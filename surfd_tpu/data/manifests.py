"""Per-dataset preprocessing manifests and conditioning-metadata loaders.

Re-implementation of the dataset-specific file discovery the reference does
inline (/root/reference/AutoEncoder/encdec/preprocess_udfs.py:19-107) and the
conditioning metadata parsing of `UDFs3d`
(/root/reference/data_loaders/dataset.py:118-137):

  * ShapeNet   — category name → synset id; ids from `<id>_{split}.lst`
                 file lists; meshes at `<root>/<id>/<sub_id>/model.obj`.
  * DeepFashion3D — ids from `deepfashion3d_{split}.txt`; meshes `<root>/<id>.obj`.
  * Pix3D      — directory walk `<root>/<split>/<cat>/<id>/model.obj`; output
                 keeps the `<cat>/<id>.npz` nesting.
  * garment_type_list.txt — category conditioning map (one line per class:
    `<garment_name> <id> <id> ...`; item ids key on the prefix before '-').
  * text2shape captions CSV — 6-column (`id,modelId,description,category,
    synsetId,subSynsetId`) or plain 2-column `id,caption`.

A manifest is a list of (mesh_path, out_relpath) pairs; the preprocessing CLI
consumes it directly.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import Dict, List, Tuple

Manifest = List[Tuple[str, str]]  # (mesh_path, out_relpath-without-extension)

# Public ShapeNet synset ids (reference preprocess_udfs.py:19-33)
SHAPENET_CAT2ID = {
    "chair": "03001627",
    "bench": "02828884",
    "cabinet": "02933112",
    "car": "02958343",
    "airplane": "02691156",
    "display": "03211117",
    "lamp": "03636649",
    "speaker": "03691459",
    "rifle": "04090263",
    "sofa": "04256520",
    "table": "04379243",
    "phone": "04401088",
    "watercraft": "04530566",
}


def shapenet_manifest(
    data_root: str, category: str, filelists_dir: str, split: str
) -> Manifest:
    """ShapeNet category manifest from the published per-synset .lst files."""
    synset = SHAPENET_CAT2ID.get(category, category)
    lst = Path(filelists_dir) / f"{synset}_{split}.lst"
    with open(lst) as f:
        sub_ids = [line.strip() for line in f if line.strip()]
    return [
        (os.path.join(data_root, synset, sid, "model.obj"), f"{synset}/{sid}")
        for sid in sub_ids
    ]


def deepfashion3d_manifest(data_root: str, lists_dir: str, split: str) -> Manifest:
    """DeepFashion3D manifest from deepfashion3d_{train,test}.txt id lists."""
    lst = Path(lists_dir) / f"deepfashion3d_{split}.txt"
    with open(lst) as f:
        ids = [line.rstrip("\n") for line in f if line.strip()]
    return [(os.path.join(data_root, f"{i}.obj"), i) for i in ids]


def pix3d_manifest(data_root: str, split: str) -> Manifest:
    """Pix3D manifest by directory walk (<root>/<split>/<cat>/<id>/model.obj),
    preserving the <cat>/<id> nesting in the output layout."""
    out: Manifest = []
    split_dir = Path(data_root) / split
    if not split_dir.is_dir():
        return out
    for cat in sorted(p for p in split_dir.iterdir() if p.is_dir()):
        for item in sorted(p for p in cat.iterdir() if p.is_dir()):
            model = item / "model.obj"
            if model.exists():
                out.append((str(model), f"{cat.name}/{item.name}"))
    return out


def generic_manifest(mesh_root: str, pattern: str = "*.obj") -> Manifest:
    """Flat glob fallback (any directory of meshes)."""
    return [
        (str(p), p.stem) for p in sorted(Path(mesh_root).rglob(pattern))
    ]


def build_manifest(
    dataset: str,
    data_root: str,
    split: str,
    category: str = "",
    filelists_dir: str = "",
) -> Manifest:
    if dataset == "shapenet":
        if not category:
            raise ValueError("shapenet manifests need --category")
        return shapenet_manifest(data_root, category, filelists_dir, split)
    if dataset == "deepfashion3d":
        return deepfashion3d_manifest(data_root, filelists_dir, split)
    if dataset == "pix3d":
        return pix3d_manifest(data_root, split)
    return generic_manifest(data_root)


def load_garment_categories(path: str) -> Tuple[Dict[str, int], Dict[int, str]]:
    """garment_type_list.txt → (item-id-prefix → class index, index → name).

    Reference parsing at data_loaders/dataset.py:129-137; item ids map via
    the prefix before '-' (dataset.py:247-249).
    """
    id2cat: Dict[str, int] = {}
    cat2name: Dict[int, str] = {}
    with open(path) as f:
        for i, line in enumerate(f):
            parts = line.strip().split(" ")
            if not parts or not parts[0]:
                continue
            cat2name[i] = parts[0]
            for item in parts[1:]:
                id2cat[item] = i
    return id2cat, cat2name


def category_for_id(item_id: str, id2cat: Dict[str, int]) -> int:
    """Garment class for a DeepFashion3D item id (prefix before '-')."""
    return id2cat.get(item_id.split("-")[0], 0)


def load_text2shape_captions(csv_path: str) -> Dict[str, str]:
    """Captions CSV → {model_id: caption}. Accepts the 6-column text2shape
    format (header `id,modelId,description,...`, dataset.py:118-127) or a
    plain 2-column `id,caption` file."""
    out: Dict[str, str] = {}
    with open(csv_path, newline="") as f:
        reader = csv.reader(f)
        rows = list(reader)
    if not rows:
        return out
    start = 1 if rows[0] and rows[0][0].lower() in ("id", '"id"') else 0
    for row in rows[start:]:
        if len(row) >= 3:  # text2shape: id, modelId, description, ...
            out[row[1]] = row[2]
        elif len(row) == 2:
            out[row[0]] = row[1]
    return out
