"""algebra-tpu: a TPU-native zkSNARK algebra framework (JAX/XLA/Pallas).

From-scratch re-design of the capability surface of the reference library
surveyed in SURVEY.md (arkworks algebra): finite fields and extension
towers, elliptic curves (short Weierstrass / twisted Edwards), pairings,
multi-scalar multiplication, polynomials and NTT domains, and canonical
serialization — built batch-first for TPU vector/matrix units, with
multi-chip scaling via jax.sharding meshes.
"""

__version__ = "0.1.0"

from .fields.spec import FieldSpec, field_spec  # noqa: F401
