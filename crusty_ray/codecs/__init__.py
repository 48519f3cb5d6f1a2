"""Deterministic image codecs + invariants (PSNR, phash) for the payload path."""
