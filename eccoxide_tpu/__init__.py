"""eccoxide_tpu: a TPU-native elliptic-curve cryptography framework.

A from-scratch JAX/Pallas rebuild of the capability surface of
vincenthz/eccoxide (Rust, CPU): SEC2 short-Weierstrass curves
(p112r1..p521r1), Curve25519 (Montgomery ladder + edwards25519),
Curve448, the ristretto255 prime-order group, and the X25519 / Ed25519 /
X448 protocols — all batched, constant-time by construction, and sharded
over device meshes for scale-out.

Layer map (mirrors SURVEY.md §1 for the reference):
  field.py               batched limb engines (solinas + Montgomery) [L0+L1]
  curves/weierstrass.py  complete projective group law, scalar mul   [L2]
  curves/{edwards,montgomery}.py  Edwards / x-only ladder            [L2]
  curves/{sec2,curve25519,curve448,ristretto255}.py  instantiations  [L3]
  params/                curve constants + comb tables               [L4]
  protocol/              X25519, Ed25519, X448                       [L5]
  parallel/              batch sharding + Pippenger MSM (new, no
                         reference counterpart)
  ops/                   host-native helpers (C++ SHA-512)
  oracle/                pure-Python cross-check implementations
"""

__version__ = "0.1.0"
