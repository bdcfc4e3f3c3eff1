"""Single-file index export/import.

The reference ships a one-file deployment mode: WriteIndex/ReadIndex
(storage.go:390-418) serialize every KV record into a single gob stream
that the CLI and serverless images load whole.  The batch-engine
analogue bundles the parquet index directory — manifest, doc tables,
postings, tags — into ONE artifact (an uncompressed zip: parquet pages
are already compressed, so ZIP_STORED keeps export/import IO-bound
rather than CPU-bound) that can be copied, versioned, or baked into an
image, then imported back into any filesystem and opened by
SearchEngine unchanged.
"""

from __future__ import annotations

import os
import zipfile

_SKIP_PREFIXES = ("_tmp",)


def export_index(index_dir: str, out_path: str) -> str:
    """Bundle a committed index directory into one file at ``out_path``."""
    from .index_build import load_manifest

    m = load_manifest(index_dir)  # raises if absent
    if m.get("phase") != "committed":
        raise ValueError(
            f"index at {index_dir} is in phase {m.get('phase')!r}; "
            "only committed indexes can be exported"
        )
    index_dir = os.path.abspath(index_dir)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as z:
        for root, dirs, files in os.walk(index_dir):
            rel_root = os.path.relpath(root, index_dir)
            if rel_root != "." and rel_root.split(os.sep)[0].startswith(_SKIP_PREFIXES):
                dirs[:] = []
                continue
            for fn in sorted(files):
                if fn == "_mutation_lock":  # never export a (stale) lease
                    continue
                p = os.path.join(root, fn)
                z.write(p, os.path.relpath(p, index_dir))
    return out_path


def import_index(bundle_path: str, dest_dir: str) -> str:
    """Unpack a bundle produced by :func:`export_index` into ``dest_dir``
    (created if needed).  Returns ``dest_dir``, ready for SearchEngine."""
    os.makedirs(dest_dir, exist_ok=True)
    dest_abs = os.path.abspath(dest_dir)
    with zipfile.ZipFile(bundle_path) as z:
        for info in z.infolist():
            # refuse traversal: every member must land inside dest_dir
            target = os.path.abspath(os.path.join(dest_abs, info.filename))
            if not target.startswith(dest_abs + os.sep):
                raise ValueError(f"unsafe bundle member: {info.filename!r}")
        z.extractall(dest_abs)
    return dest_dir
