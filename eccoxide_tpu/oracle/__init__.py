"""Pure-Python big-integer oracle implementations.

Independent textbook implementations (Python ints, non-constant-time) used
as the cross-check oracle for the TPU engines — the role sage/magma plays
for the reference (/root/reference/README.md:22-23, sage/*.sage). Also used
to generate comb tables (tools/gen_comb.py), replacing sage/comb.sage.
"""
