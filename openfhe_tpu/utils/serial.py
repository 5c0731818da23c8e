"""Serialization of contexts, keys, and ciphertexts (checkpoint/resume).

Role of the reference's cereal-based Serial::Serialize/Deserialize layer
(``utils/serial.h``, per-type ``*-ser.h`` headers): round-trippable binary
archives for every user-visible object, in BOTH of the reference's SerType
flavors: ``fmt="binary"`` (default; one .npz holding the limb arrays plus
one JSON metadata entry) and ``fmt="json"`` (a single human-readable JSON
document with base64-embedded arrays — the analog of cereal's
SerType::JSON). Scheme contexts are reconstructed deterministically from
their parameter sets, so only params are stored for them. ``load``
auto-detects the format from the file magic.
"""

from __future__ import annotations

import base64
import dataclasses
import io
import json
from typing import Any

import numpy as np

SERIAL_VERSION = 1


def _array_to_json(a: np.ndarray) -> dict:
    buf = io.BytesIO()
    np.save(buf, np.asarray(a), allow_pickle=False)
    return {"npy_b64": base64.b64encode(buf.getvalue()).decode()}


def _array_from_json(d: dict) -> np.ndarray:
    return np.load(io.BytesIO(base64.b64decode(d["npy_b64"])),
                   allow_pickle=False)


def _ckks():
    from ..models import ckks
    return ckks


def _bgv():
    from ..models import bgv
    return bgv


def _bfv():
    from ..models import bfv
    return bfv


def _poly_arrays(prefix: str, p, arrays: dict) -> dict:
    arrays[f"{prefix}.lo"] = np.asarray(p.lo)
    arrays[f"{prefix}.hi"] = np.asarray(p.hi)
    return {"basis_n": p.basis.n,
            "basis_moduli": [str(q) for q in p.basis.moduli],
            "fmt": p.fmt.value}


def _poly_restore(prefix: str, meta, arrays):
    from .. import dcrt
    basis = dcrt.RnsBasis(meta["basis_n"],
                          tuple(int(q) for q in meta["basis_moduli"]))
    return dcrt.RnsPoly(arrays[f"{prefix}.lo"], arrays[f"{prefix}.hi"],
                        basis, dcrt.Format(meta["fmt"]))


def _params_to_dict(params) -> dict:
    return {k: v for k, v in dataclasses.asdict(params).items()}


def save(obj: Any, path: str, fmt: str = "binary") -> None:
    assert fmt in ("binary", "json"), fmt
    arrays: dict = {}
    meta: dict = {"version": SERIAL_VERSION}
    t = type(obj).__name__
    mod = type(obj).__module__

    if t == "CKKSContext":
        meta.update(kind="ckks_context", params=_params_to_dict(obj.params),
                    q_moduli=[str(q) for q in obj.q_moduli],
                    p_moduli=[str(p) for p in obj.p_moduli])
    elif t == "BGVContext":
        meta.update(kind="bgv_context", params=_params_to_dict(obj.params),
                    q_moduli=[str(q) for q in obj.q_moduli],
                    p_moduli=[str(p) for p in obj.p_moduli])
    elif t == "BFVContext":
        meta.update(kind="bfv_context", params=_params_to_dict(obj.params),
                    q_moduli=[str(q) for q in obj.q_moduli],
                    r_moduli=[str(r) for r in obj.r_moduli],
                    p_moduli=[str(p) for p in obj.p_moduli])
    elif t == "Ciphertext" and "ckks" in mod:
        meta.update(kind="ckks_ciphertext", scale=obj.scale,
                    polys=[_poly_arrays(f"poly{i}", p, arrays)
                           for i, p in enumerate(obj.polys)])
    elif t == "Ciphertext":
        kind = "bgv_ciphertext" if "bgv" in mod else "bfv_ciphertext"
        meta.update(kind=kind,
                    polys=[_poly_arrays(f"poly{i}", p, arrays)
                           for i, p in enumerate(obj.polys)])
    elif t == "PublicKey":
        meta.update(kind="public_key",
                    b=_poly_arrays("b", obj.b, arrays),
                    a=_poly_arrays("a", obj.a, arrays))
    elif t == "SecretKey":
        meta.update(kind="secret_key")
        arrays["coeffs"] = np.asarray(obj.coeffs, dtype=np.int64)
    elif t == "KSKey":
        p = obj.params
        meta.update(kind="ks_key",
                    ks_params={"n": p.n,
                               "q_moduli": [str(q) for q in p.q_moduli],
                               "p_moduli": [str(q) for q in p.p_moduli],
                               "alpha": p.alpha,
                               "plaintext_correction": p.plaintext_correction})
        for name in ("b_lo", "b_hi", "a_lo", "a_hi"):
            arrays[name] = np.asarray(getattr(obj, name))
    elif t == "BinFHEContext":
        meta.update(kind="binfhe_context",
                    params=dataclasses.asdict(obj.params))
    elif t == "LWECiphertext":
        meta.update(kind="lwe_ciphertext", b=int(obj.b),
                    modulus=int(obj.modulus))
        arrays["a"] = np.asarray(obj.a, dtype=np.int64)
    elif t == "BinFHESecret":
        meta.update(kind="binfhe_secret")
        arrays["s_lwe"] = np.asarray(obj.s_lwe, dtype=np.int64)
        arrays["z_ring"] = np.asarray(obj.z_ring, dtype=np.int64)
    elif t == "BootstrapKey":
        meta.update(kind="binfhe_bootstrap_key")
        for name in ("ek_lo", "ek_hi", "ks_a", "ks_b"):
            arrays[name] = np.asarray(getattr(obj, name))
    elif t == "LMKCDEYKey":
        meta.update(kind="binfhe_lmkcdey_key")
        for name in ("ek_lo", "ek_hi", "ak_lo", "ak_hi", "ks_a", "ks_b"):
            arrays[name] = np.asarray(getattr(obj, name))
    else:
        raise TypeError(f"don't know how to serialize {mod}.{t}")

    if fmt == "json":
        doc = {"__meta__": meta,
               "arrays": {k: _array_to_json(v) for k, v in arrays.items()}}
        with open(path, "w") as f:
            json.dump(doc, f)
        return
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load(path: str) -> Any:
    with open(path, "rb") as f:
        magic = f.read(1)
    if magic == b"{":  # JSON flavor
        with open(path) as f:
            doc = json.load(f)
        meta = doc["__meta__"]
        arrays = {k: _array_from_json(v) for k, v in doc["arrays"].items()}
    else:
        with np.load(path) as z:
            arrays = {k: z[k] for k in z.files}
        meta = json.loads(bytes(arrays.pop("__meta__")).decode())
    assert meta["version"] <= SERIAL_VERSION, "newer serial format"
    kind = meta["kind"]

    if kind == "ckks_context":
        m = _ckks()
        return m.CKKSContext(m.CKKSParams(**meta["params"]),
                             tuple(int(q) for q in meta["q_moduli"]),
                             tuple(int(p) for p in meta["p_moduli"]))
    if kind == "bgv_context":
        m = _bgv()
        return m.BGVContext(m.BGVParams(**meta["params"]),
                            tuple(int(q) for q in meta["q_moduli"]),
                            tuple(int(p) for p in meta["p_moduli"]))
    if kind == "bfv_context":
        m = _bfv()
        return m.BFVContext(m.BFVParams(**meta["params"]),
                            tuple(int(q) for q in meta["q_moduli"]),
                            tuple(int(r) for r in meta["r_moduli"]),
                            tuple(int(p) for p in meta["p_moduli"]))
    if kind == "ckks_ciphertext":
        m = _ckks()
        polys = tuple(_poly_restore(f"poly{i}", pm, arrays)
                      for i, pm in enumerate(meta["polys"]))
        return m.Ciphertext(polys, meta["scale"])
    if kind in ("bgv_ciphertext", "bfv_ciphertext"):
        m = _bgv() if kind.startswith("bgv") else _bfv()
        polys = tuple(_poly_restore(f"poly{i}", pm, arrays)
                      for i, pm in enumerate(meta["polys"]))
        return m.Ciphertext(polys)
    if kind == "public_key":
        m = _ckks()
        return m.PublicKey(_poly_restore("b", meta["b"], arrays),
                           _poly_restore("a", meta["a"], arrays))
    if kind == "secret_key":
        m = _ckks()
        return m.SecretKey(arrays["coeffs"])
    if kind == "ks_key":
        from .. import keyswitch
        kp = meta["ks_params"]
        params = keyswitch.KSParams(
            kp["n"], tuple(int(q) for q in kp["q_moduli"]),
            tuple(int(p) for p in kp["p_moduli"]), kp["alpha"],
            kp.get("plaintext_correction", 1))
        return keyswitch.KSKey(arrays["b_lo"], arrays["b_hi"],
                               arrays["a_lo"], arrays["a_hi"], params)
    if kind == "binfhe_context":
        from ..models import binfhe
        return binfhe.BinFHEContext(binfhe.BinFHEParams(**meta["params"]))
    if kind == "lwe_ciphertext":
        from ..models import binfhe
        return binfhe.LWECiphertext(arrays["a"], meta["b"], meta["modulus"])
    if kind == "binfhe_secret":
        from ..models import binfhe
        return binfhe.BinFHESecret(arrays["s_lwe"], arrays["z_ring"])
    if kind == "binfhe_bootstrap_key":
        from ..models import binfhe
        import jax.numpy as jnp
        return binfhe.BootstrapKey(jnp.asarray(arrays["ek_lo"]),
                                   jnp.asarray(arrays["ek_hi"]),
                                   jnp.asarray(arrays["ks_a"]),
                                   jnp.asarray(arrays["ks_b"]))
    if kind == "binfhe_lmkcdey_key":
        from ..models import binfhe
        import jax.numpy as jnp
        return binfhe.LMKCDEYKey(*(jnp.asarray(arrays[n]) for n in
                                   ("ek_lo", "ek_hi", "ak_lo", "ak_hi",
                                    "ks_a", "ks_b")))
    raise TypeError(f"unknown serialized kind {kind}")
