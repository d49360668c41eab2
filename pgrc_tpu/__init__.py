"""pgrc_tpu — TPU-native sequencing-read compression engine (PgRC method).

A from-scratch JAX/XLA implementation of pseudogenome-based read compression:
greedy approximate shortest-common-superstring construction over high-quality
reads, bounded-mismatch alignment of the remaining reads, and per-stream
entropy coding. See DESIGN.md and SURVEY.md.
"""

__version__ = "0.1.0"

ARCHIVE_MAGIC = b"PGTC"
ARCHIVE_VERSION = (1, 0)

from .utils.errors import PgtcFormatError  # noqa: E402,F401  (public API)
