"""Scalar expression builders (hashing, ABI, numeric parity, text, vectors)."""
