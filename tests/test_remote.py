"""Remote checkpoint URI round trip (file:// scheme, no cloud creds).

Ref: main.py:21-44 fetches s3:// resume paths; push_to_hf.py:28-80 uploads
artifacts.  utils/remote.py adds gs://|s3://|file:// both ways; the
file:// scheme proves the round trip hermetically.
"""

import os

from add_gym_tpu.utils.remote import fetch_dir, is_remote, push_dir


def _make_tree(root):
    os.makedirs(os.path.join(root, "sub"))
    with open(os.path.join(root, "a.txt"), "w") as f:
        f.write("alpha")
    with open(os.path.join(root, "sub", "b.bin"), "wb") as f:
        f.write(b"\x00\x01\x02")


def test_is_remote():
    assert is_remote("gs://bucket/ckpt")
    assert is_remote("s3://bucket/ckpt")
    assert is_remote("file:///tmp/x")
    assert not is_remote("/tmp/x")
    assert not is_remote(None)
    assert not is_remote("")


def test_fetch_local_passthrough(tmp_path):
    d = tmp_path / "ckpt"
    d.mkdir()
    assert fetch_dir(str(d)) == str(d)


def test_push_fetch_roundtrip(tmp_path):
    src = tmp_path / "artifact"
    src.mkdir()
    _make_tree(str(src))

    remote = f"file://{tmp_path}/remote_store"
    push_dir(str(src), remote)

    local = fetch_dir(remote, cache_dir=str(tmp_path / "cache"))
    assert open(os.path.join(local, "a.txt")).read() == "alpha"
    assert open(os.path.join(local, "sub", "b.bin"), "rb").read() == b"\x00\x01\x02"

    # re-fetch replaces a stale cache copy
    with open(os.path.join(local, "a.txt"), "w") as f:
        f.write("stale")
    local2 = fetch_dir(remote, cache_dir=str(tmp_path / "cache"))
    assert open(os.path.join(local2, "a.txt")).read() == "alpha"
