"""openfhe_tpu — a TPU-native RNS-FHE framework (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of the UPMEM--OpenFHE reference
(BGV/BFV/CKKS over Double-CRT polynomials, hybrid key switching, packed
encodings, CKKS bootstrapping, FHEW/TFHE boolean gates), re-architected for
TPU hardware: residues live as 32-bit limb arrays in HBM, hot kernels are
Pallas/VPU programs, and scale-out uses jax.sharding meshes + ICI collectives
instead of a host-mediated accelerator offload.
"""

__version__ = "0.1.0"
