"""Generate README's artifact-numbers block FROM the committed
artifacts (VERDICT r13 #2: round 12 and round 13 each shipped README
sentences citing superseded mid-round figures; deriving the cited
numbers mechanically removes the failure mode).

The block is delimited in README.md by
``<!-- AUTOGEN:artifact-numbers -->`` / ``<!-- /AUTOGEN... -->``
markers. ``python tools/readme_numbers.py`` prints the current block;
``--write`` splices it into README.md in place.
tests/test_docs_numbers.py regenerates the block and diffs it against
the README — a stale number fails the suite instead of shipping.
"""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- AUTOGEN:artifact-numbers (tools/readme_numbers.py) -->"
END = "<!-- /AUTOGEN:artifact-numbers -->"


def _load(name: str) -> dict:
    with open(os.path.join(ROOT, name)) as f:
        return json.load(f)


def generate() -> str:
    bf = _load("BENCH_FULL.json")
    br = _load("BENCH_REVERSED.json")
    sc = _load("SCALECHECK.json")
    qf, qr = bf["queries"], br["queries"]
    shared = [n for n in qf if n in qr and min(qf[n], qr[n]) > 0]
    worst = max(shared, key=lambda n: max(qf[n], qr[n]) / min(qf[n], qr[n]))
    wr = max(qf[worst], qr[worst]) / min(qf[worst], qr[worst])
    lc_f, lc_r = qf.get("ivf_pq_lifecycle_ann"), qr.get("ivf_pq_lifecycle_ann")
    resid = sc.get("scrub_residue", {})
    nonzero = {k: v for k, v in resid.items() if v}
    resid_line = (
        "all sections zero"
        if not nonzero
        else ", ".join(f"{k}={v}" for k, v in sorted(nonzero.items()))
    )
    ex = bf.get("extra", {})
    lines = [
        BEGIN,
        "Committed-artifact numbers (regenerate with `python",
        "tools/readme_numbers.py --write`; enforced by",
        "tests/test_docs_numbers.py):",
        "",
        f"- Both-order suite (BENCH_FULL / BENCH_REVERSED, sf0.1): "
        f"{len(qf)} query rows, {bf['value']:.1f} s forward / "
        f"{br['value']:.1f} s reversed.",
        f"- HNSW dim-512 build: {ex.get('build512_vecs_per_sec_per_core')} "
        f"vec/s/core forward (reversed artifact: "
        f"{br.get('extra', {}).get('build512_vecs_per_sec_per_core')}), "
        f"recall@10 = {ex.get('hnsw_recall_at_10')}.",
        f"- `ivf_pq_lifecycle_ann`: {lc_f} s forward / {lc_r} s reversed "
        f"(ratio {max(lc_f, lc_r) / min(lc_f, lc_r):.2f}).",
        f"- Largest forward/reversed ratio in the suite: `{worst}` "
        f"({qf[worst]} / {qr[worst]}, {wr:.2f}x).",
        f"- SCALECHECK `scrub_residue` ledger: {resid_line}.",
        END,
    ]
    return "\n".join(lines)


def main() -> None:
    block = generate()
    if "--write" in sys.argv:
        path = os.path.join(ROOT, "README.md")
        with open(path) as f:
            text = f.read()
        if BEGIN in text:
            pre = text.split(BEGIN)[0]
            post = text.split(END, 1)[1]
            text = pre + block + post
        else:
            raise SystemExit(
                "README.md has no artifact-numbers markers; add them first"
            )
        with open(path, "w") as f:
            f.write(text)
        print("README.md updated")
    else:
        print(block)


if __name__ == "__main__":
    main()
