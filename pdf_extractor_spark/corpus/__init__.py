"""Deterministic synthetic page-corpus generation (FIXTURES.md).

No external data; a single seed drives everything (driver instruction:
synthesise the input table deterministically at small scale)."""
