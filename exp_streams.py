"""Print per-stream compressed sizes of a PGTC archive (ratio analysis).

Usage: python exp_streams.py archive.pgtc
"""
import sys

sys.path.insert(0, "/root/repo")

from pgrc_tpu import ARCHIVE_MAGIC
from pgrc_tpu.utils.varint import read_varint

path = sys.argv[1]
buf = open(path, "rb").read()
assert buf[:4] == ARCHIVE_MAGIC
pos = 8
hdr = []
for name in ("read_len", "reads_total", "hq_count", "lq_count", "n_count",
             "hq_pg_len", "lq_pg_len", "n_pg_len"):
    v, pos = read_varint(buf, pos)
    hdr.append((name, v))
print(" ".join(f"{k}={v}" for k, v in hdr))
bases = hdr[0][1] * hdr[1][1]
print(f"total {len(buf)} B = {len(buf)*8/bases:.4f} bits/base")

# scan forward for well-formed stream records: {u8 coder, u8 p1, u8 p2,
# varint rawLen, varint compLen, payload} (container._compress_one); the
# few raw prop blobs between sections are skipped by the validity check
i = 0
total = 0
while pos < len(buf) - 4:
    try:
        coder = buf[pos]
        raw, p2 = read_varint(buf, pos + 3)
        comp, p3 = read_varint(buf, p2)
        if coder > 16 or comp > len(buf) - p3 or raw > (1 << 40) or (
                comp > raw and raw > 0):
            pos += 1
            continue
        print(f"  @{pos:8d} coder={coder:3d} raw={raw:9d} comp={comp:9d} "
              f"({(comp/max(raw,1))*100:5.1f}%)  [{comp*8/bases:.4f} b/b]")
        total += comp
        pos = p3 + comp
        i += 1
    except Exception:
        pos += 1
print(f"sum of stream payloads: {total} B (header/overhead {len(buf)-total} B)")
