"""Remote artifact transfer: gs:// | s3:// | file:// checkpoint URIs.

Reference equivalent: ``main.py:21-44`` (``_resolve_resume_path`` shells
out to ``aws s3 cp``) and ``publish/push_to_hf.py:28-80`` (artifact
upload).  Orbax checkpoints are directories, so transfers are recursive.

``file://`` is a first-class scheme so the round-trip is testable without
cloud credentials (tests/test_remote.py); gs:// and s3:// shell out to
``gcloud storage`` / ``gsutil`` / ``aws`` — whichever is installed on the
TPU VM image.
"""

from __future__ import annotations

import os
import shutil
import subprocess


def is_remote(uri: str | None) -> bool:
    return bool(uri) and uri.startswith(("gs://", "s3://", "file://"))


def _run(cmd):
    subprocess.run(cmd, check=True)


def _gs_copy(src: str, dst: str):
    """Recursive copy via whichever GCS CLI exists."""
    if shutil.which("gcloud"):
        _run(["gcloud", "storage", "cp", "-r", src, dst])
    elif shutil.which("gsutil"):
        _run(["gsutil", "-m", "cp", "-r", src, dst])
    else:
        raise RuntimeError("no gcloud/gsutil on PATH for gs:// transfer")


def _s3_copy(src: str, dst: str):
    if not shutil.which("aws"):
        raise RuntimeError("no aws CLI on PATH for s3:// transfer")
    _run(["aws", "s3", "cp", "--recursive", src, dst])


def fetch_dir(uri: str, cache_dir: str = "/tmp/agt_checkpoints") -> str:
    """Resolve a checkpoint URI to a local directory path.

    Local paths pass through; remote URIs download into ``cache_dir`` and
    return the local copy (ref main.py:28-44 semantics).
    """
    if not is_remote(uri):
        return os.path.abspath(uri)
    name = uri.rstrip("/").rsplit("/", 1)[-1]
    dest = os.path.join(cache_dir, name)
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.makedirs(cache_dir, exist_ok=True)
    if uri.startswith("file://"):
        shutil.copytree(uri[len("file://"):], dest)
    elif uri.startswith("gs://"):
        _gs_copy(uri, dest)
    else:
        _s3_copy(uri, dest)
    print(f"Fetched checkpoint {uri} -> {dest}")
    return dest


def push_dir(local_dir: str, uri: str) -> None:
    """Upload a local artifact directory to a remote URI.

    Completes the publish pipeline (ref push_to_hf.py:28-80: the reference
    pushes to HuggingFace; here any gs://, s3:// or file:// destination).
    """
    local_dir = os.path.abspath(local_dir)
    if uri.startswith("file://"):
        dest = uri[len("file://"):]
        if os.path.exists(dest):
            shutil.rmtree(dest)
        shutil.copytree(local_dir, dest)
    elif uri.startswith("gs://"):
        _gs_copy(local_dir, uri)
    elif uri.startswith("s3://"):
        _s3_copy(local_dir, uri)
    else:
        raise ValueError(f"unsupported destination URI: {uri}")
    print(f"Pushed {local_dir} -> {uri}")
