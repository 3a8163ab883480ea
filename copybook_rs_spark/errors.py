"""Structured error taxonomy for the engine.

Mirrors the reference's stable CBK* error-code discipline
(reference: docs/reference/ERROR_CODES.md; corruption detectors at
crates/copybook-corruption-detectors/src/lib.rs:17,41): decode of a corrupt
blob must raise a *structured* error, never return wrong data.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class; every error carries a stable code."""

    code: str = "CBSP000"

    def __init__(self, message: str, code: str | None = None):
        if code is not None:
            self.code = code
        super().__init__(f"{self.code}: {message}")


class BlobFormatError(EngineError):
    """Malformed / corrupt chunk blob (framing layer)."""

    code = "CBSP100"


class BadMagicError(BlobFormatError):
    code = "CBSP101"


class BadVersionError(BlobFormatError):
    code = "CBSP102"


class CrcMismatchError(BlobFormatError):
    code = "CBSP103"


class TruncatedBlobError(BlobFormatError):
    code = "CBSP104"


class HeaderInvalidError(BlobFormatError):
    code = "CBSP105"


class CodecError(EngineError):
    """Payload-level codec failure."""

    code = "CBSP200"


class UnknownCodecError(CodecError):
    code = "CBSP201"


class ValueOverflowError(CodecError):
    code = "CBSP202"


class CountMismatchError(CodecError):
    code = "CBSP203"


class PayloadCorruptError(CodecError):
    code = "CBSP204"


class ErrorBudgetExceededError(EngineError):
    """Lenient decode passed its max_errors budget (the bounded-error
    policy of the reference's DecodeOptions,
    crates/copybook-options/src/lib.rs:48-83): corruption was counted and
    skipped up to the budget, then the run fails typed."""

    code = "CBSP205"


class PipelineContractError(EngineError):
    """Input violates a pipeline contract — e.g. the pregrouped encode fast
    path fed input whose (source, part_id) groups are split, interleaved, or
    not sorted by doc_id. Raised instead of silently producing chunk content
    that differs from the canonical (exchange-path) encoding."""

    code = "CBSP300"
