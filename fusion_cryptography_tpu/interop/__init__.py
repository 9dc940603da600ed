"""Interoperability layer: reference-exact serialization, the object-level compat
API mirroring the reference's public classes, and the KAT corpus harness."""
