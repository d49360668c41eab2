"""Print per-stream compressed sizes of a PGTC archive (ratio analysis).

Traces the decoder's actual record walk (monkeypatched _read_record), so
every size is exact. Usage: python exp_streams.py archive.pgtc
"""
import sys

sys.path.insert(0, "/root/repo")

from pgrc_tpu.streams import container
from pgrc_tpu.archive import decoder

path = sys.argv[1]
records = []
orig = container._read_record


def spy(buf, pos):
    codec, raw_len, payload, npos = orig(buf, pos)
    records.append((pos, codec.coder_id, raw_len, len(payload)))
    return codec, raw_len, payload, npos


container._read_record = spy
ar = decoder.load(path)
container._read_record = orig

import os

total = os.path.getsize(path)
bases = ar.reads_total * ar.read_len
print(f"reads={ar.reads_total} L={ar.read_len} hq={ar.hq_count} "
      f"lq={ar.lq_count} n={ar.n_count} pg={len(ar.hq_pg)}+{len(ar.lq_pg)}"
      f"+{len(ar.n_pg)}")
print(f"total {total} B = {total * 8 / bases:.4f} bits/base")
payload_sum = 0
for pos, coder, raw, comp in records:
    print(f"  @{pos:9d} coder={coder:3d} raw={raw:10d} comp={comp:10d} "
          f"({comp / max(raw, 1) * 100:5.1f}%)  [{comp * 8 / bases:.4f} b/b]")
    payload_sum += comp
print(f"sum of stream payloads: {payload_sum} B "
      f"(headers/props: {total - payload_sum} B)")
