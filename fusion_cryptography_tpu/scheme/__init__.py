"""Scheme layer: batched tensor-native keygen / sign / aggregate / verify."""
from .lifecycle import (
    KeyBatch,
    SignatureBatch,
    keygen,
    sign,
    aggregate,
    verify,
    verify_batch,
    verify_many,
)
