"""Boolean FHEW/TFHE gates (role of ``src/binfhe/examples/boolean.cpp``)."""

import common  # noqa: F401
import numpy as np

from openfhe_tpu.models import binfhe

rng = np.random.default_rng(1)

ctx = binfhe.gen_context("TOY")
sk = binfhe.keygen(ctx, rng)
bk = binfhe.bootstrap_keygen(ctx, sk, rng)

ct1 = binfhe.encrypt(ctx, sk, 1, rng)
ct2 = binfhe.encrypt(ctx, sk, 0, rng)

for gate in ("AND", "OR", "NAND", "XOR"):
    out = binfhe.eval_gate(ctx, gate, bk, ct1, ct2)
    print(f"{gate}(1, 0) = {binfhe.decrypt(ctx, sk, out)}")
print("NOT(1)    =", binfhe.decrypt(ctx, sk, binfhe.eval_not(ctx, ct1)))
