"""Native batched SHA-512 vs hashlib (VERDICT r1 #3).

The native C++ backend (native/sha512.cpp, threaded) must agree with
hashlib byte-for-byte across random lengths, including empty messages,
and must actually be the path used by the Ed25519 host pipeline.
"""

import hashlib
import random

import numpy as np

from eccoxide_tpu.ops.sha512 import _build_and_load, sha512_batch


def test_native_lib_builds():
    assert _build_and_load() is not None, "native sha512 failed to build"


def test_native_matches_hashlib_random_lengths():
    rng = random.Random(1)
    msgs = [b""] + [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 513)))
        for _ in range(100)
    ]
    out = sha512_batch(msgs)
    assert out.shape == (64, len(msgs))
    for j, m in enumerate(msgs):
        assert bytes(out[:, j].astype(np.uint8)) == hashlib.sha512(m).digest()


def test_ed25519_host_uses_batch_backend():
    # sha512_batch_host must route through ops.sha512 (not a hashlib loop)
    import inspect

    from eccoxide_tpu.protocol import ed25519 as ed

    src = inspect.getsource(ed.sha512_batch_host)
    assert "sha512_batch" in src and "hashlib.sha512" not in src
