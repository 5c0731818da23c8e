"""Boolean FHEW, dynamic large-precision, BINARY serialization (role of
``binfhe/examples/boolean-serial-binary-dynamic-large-precision.cpp``):
a large-precision context (phase modulus >> 2N) is serialized together
with its keys and a large-precision ciphertext; the deserialized objects
run a homomorphic floor — the op the dynamic large-precision pipeline
exists for."""

import os
import tempfile

import common  # noqa: F401
import numpy as np

from openfhe_tpu.models import binfhe
from openfhe_tpu.utils import serial

FMT = globals().get("FMT", "binary")
rng = np.random.default_rng(31)
tmp = tempfile.mkdtemp(prefix=f"openfhe_tpu_boolser_lp_{FMT}_")
ext = "npz" if FMT == "binary" else "json"

ctx1 = binfhe.gen_context("TOY_LP")
sk1 = binfhe.keygen(ctx1, rng)
bk1 = binfhe.bootstrap_keygen(ctx1, sk1, rng)
print("Done generating all keys.")

mod = ctx1.params.q_ks      # large input modulus (the "dynamic" Q)
value = 9871
ct1 = binfhe.encrypt_phase(ctx1, sk1, value, mod, rng)

for name, obj in [("cryptoContext", ctx1), ("refreshKey", bk1),
                  ("sk1", sk1), ("ct1", ct1)]:
    serial.save(obj, os.path.join(tmp, f"{name}.{ext}"), fmt=FMT)
print(f"Large-precision context/keys/ciphertext serialized ({FMT}) to", tmp)

ctx = serial.load(os.path.join(tmp, f"cryptoContext.{ext}"))
bk = serial.load(os.path.join(tmp, f"refreshKey.{ext}"))
sk = serial.load(os.path.join(tmp, f"sk1.{ext}"))
ct = serial.load(os.path.join(tmp, f"ct1.{ext}"))
print("Deserialized.")

q = 2 * ctx.params.N
beta = 64
floored = binfhe.eval_floor(ctx, bk, ct, beta)
got = binfhe.decrypt_phase(ctx, sk, floored)
want = (value + beta) - ((value + beta) % q)
print(f"EvalFloor({value}) -> {got} (expected {want} +- {q} + noise)")
assert abs(got - want) <= 2 * q, (got, want)
