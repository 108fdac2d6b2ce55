"""Native C++ data loader: build, parity with the numpy fallbacks, speed."""

import glob
import os
import time


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0

import numpy as np
import pytest

from add_gym_tpu import native
from add_gym_tpu.physics.stl import stl_aabb as py_stl_aabb
from add_gym_tpu.utils.assets import asset_root


@pytest.fixture(scope="module")
def motion_file():
    files = sorted(glob.glob(os.path.join(asset_root(), "motions", "*.motion")))
    assert files, "no .motion assets found"
    return files[0]


@pytest.fixture(scope="module")
def stl_file():
    files = sorted(
        glob.glob(os.path.join(asset_root(), "g1_description", "meshes", "*.STL"))
    )
    if not files:
        files = sorted(
            glob.glob(os.path.join(asset_root(), "g1_description", "**", "*.STL"),
                      recursive=True)
        )
    assert files, "no STL assets found"
    return files[0]


def test_native_builds():
    assert native.available(), "native loader failed to build (g++ available?)"


def test_csv_parity(motion_file):
    ref = np.atleast_2d(np.loadtxt(motion_file, delimiter=",", dtype=np.float64))
    got = native.parse_motion_csv(motion_file)
    assert got.shape == ref.shape == (ref.shape[0], 36)
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_csv_tmpfile_edge_cases(tmp_path):
    # no trailing newline, CRLF, extra separators
    p = tmp_path / "edge.motion"
    p.write_text("1.0, 2.0, 3.0\r\n4,5,6\n7 , 8,\t9")
    got = native.parse_motion_csv(str(p))
    np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])


def test_csv_ragged_rejected(tmp_path):
    p = tmp_path / "ragged.motion"
    p.write_text("1,2,3\n4,5\n")
    if native.available():
        with pytest.raises(IOError):
            native.parse_motion_csv(str(p))


def test_stl_parity(stl_file):
    lo_py, hi_py = py_stl_aabb(stl_file)
    lo_c, hi_c = native.stl_aabb(stl_file)
    np.testing.assert_allclose(lo_c, lo_py, atol=0)
    np.testing.assert_allclose(hi_c, hi_py, atol=0)


def test_csv_speedup(motion_file):
    """The native parser should beat np.loadtxt comfortably."""
    if not native.available():
        pytest.skip("native lib unavailable")

    # best-of-3 each: single samples flake when the 1-core CI host is
    # contended (another process preempting one side of the comparison)
    def best(fn):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native = best(lambda: native.parse_motion_csv(motion_file))
    t_numpy = best(
        lambda: np.loadtxt(motion_file, delimiter=",", dtype=np.float64)
    )
    assert t_native < t_numpy
