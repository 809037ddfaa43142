"""App data directories + image library operations.

Behavior contract: reference `ui/initializer.py:78-116 first_init`
creates ~/.cremage/{tmp,outputs,trash,favorites,data/faces,
embedding_images}; the image listbox supports mark/goto/favorite/delete
keyboard ops (`ui/image_listbox_handlers.py:58-190`). Headless
equivalents: directory bootstrap + favorite/trash/list operations over
the outputs dir, consumable from the HTTP API.
"""
from __future__ import annotations

import os
import re
import shutil
import time
from typing import Dict, List, Optional

APP_DIR_NAME = ".cremage_tpu"
SUBDIRS = ("tmp", "outputs", "trash", "favorites", "data/faces",
           "embedding_images", "tmp/svd/frames")


def app_root(base: Optional[str] = None) -> str:
    return base or os.path.join(os.path.expanduser("~"), APP_DIR_NAME)


def first_init(base: Optional[str] = None) -> str:
    root = app_root(base)
    for sub in SUBDIRS:
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    return root


def list_images(root: str, which: str = "outputs") -> List[Dict]:
    """Newest-first listing with metadata presence flag."""
    d = os.path.join(root, which)
    out = []
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if not name.lower().endswith(".png"):
            continue
        p = os.path.join(d, name)
        out.append({"name": name, "path": p, "mtime": os.path.getmtime(p)})
    out.sort(key=lambda e: -e["mtime"])
    return out


_output_seq = 0


def save_output_image(root: str, png_bytes: bytes) -> str:
    """Persist a generated PNG into the outputs library — the reference
    saves every result to its output dir before queueing it to the UI
    (`modules/sd/image_generator.py:1204-1212`).  Timestamp + sequence
    naming keeps listings chronological and names unique."""
    global _output_seq
    d = os.path.join(root, "outputs")
    os.makedirs(d, exist_ok=True)
    _output_seq += 1
    name = "%s_%06d.png" % (time.strftime("%Y%m%d-%H%M%S"), _output_seq)
    path = os.path.join(d, name)
    with open(path, "wb") as f:
        f.write(png_bytes)
    return path


def favorite_image(root: str, path: str) -> str:
    """Copy into favorites (reference `f` key)."""
    dest = os.path.join(root, "favorites", os.path.basename(path))
    shutil.copyfile(path, dest)
    return dest


def trash_image(root: str, path: str) -> str:
    """Move into trash instead of deleting (reference delete key)."""
    base = os.path.basename(path)
    dest = os.path.join(root, "trash", base)
    if os.path.exists(dest):
        stem, ext = os.path.splitext(base)
        dest = os.path.join(root, "trash", f"{stem}_{int(time.time())}{ext}")
    shutil.move(path, dest)
    return dest


# ---- face storage (reference app_misc_utils.py:25-76: FaceID source
# faces saved as data/faces/face_NNNNNN.png with the next sequential id;
# drag-and-drop and the face input view both feed it) ----

_FACE_RE = re.compile(r"^face_([0-9]+)\.png$")


def next_face_file_id(files: List[str]) -> int:
    """Reference get_next_file_id_from_list_of_file_names_with_numbers
    semantics (golden-tested): max existing face_N id + 1, else 0."""
    ids = [int(m.group(1)) for f in files
           for m in [_FACE_RE.search(f)] if m]
    return max(ids) + 1 if ids else 0


def save_face_image(root: str, image01) -> str:
    """Store a FaceID source face into data/faces with the next id."""
    import numpy as _np
    from PIL import Image

    d = os.path.join(root, "data", "faces")
    os.makedirs(d, exist_ok=True)
    new_id = next_face_file_id(os.listdir(d))
    path = os.path.join(d, f"face_{new_id:06d}.png")
    Image.fromarray(
        (_np.clip(image01, 0, 1) * 255).astype(_np.uint8)).save(path)
    return path


def list_faces(root: str) -> List[str]:
    d = os.path.join(root, "data", "faces")
    if not os.path.isdir(d):
        return []
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if _FACE_RE.search(f))
