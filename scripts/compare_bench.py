"""Diff two bench JSON records on their query intersection.

Usage: python scripts/compare_bench.py OLD.json NEW.json [--isolated]

Prints the intersection sum ratio and the biggest movers for the
chosen pass (in-session by default; --isolated compares the isolated
pass, which is only meaningful within one N_GROUPS bucketing era —
r8+ is the crc32 % 11 era). Reads the LAST line of each file, so raw
driver captures with leading noise work as-is.
"""
import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    try:
        # a committed full record (docs/bench_full_latest.json) is one
        # pretty-printed JSON object
        return json.loads(text)
    except json.JSONDecodeError:
        # a raw stdout capture ends with the compact/full single-line
        # record; leading progress noise is fine
        lines = [ln for ln in text.splitlines() if ln.strip()]
        return json.loads(lines[-1])


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    key = "queries_isolated" if "--isolated" in sys.argv else "queries"
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = _load(args[0]), _load(args[1])
    qo, qn = old.get(key, {}), new.get(key, {})
    inter = sorted(set(qo) & set(qn))
    if not inter:
        print(f"no {key} intersection")
        return 1
    so, sn = sum(qo[n] for n in inter), sum(qn[n] for n in inter)
    print(
        f"{key}: n={len(inter)} old={so:.2f}s new={sn:.2f}s "
        f"ratio={sn / so:.3f}"
    )
    # Calibration-normalized ratio: each side divided by its recorded
    # machine-speed scalar (bench.py:_calibration_probe), so a VM swap
    # between captures reads ~1.0x instead of a phantom regression
    # (r10 spent a round adjudicating a 2.9x environmental artifact).
    co, cn = old.get("calib_sec"), new.get("calib_sec")
    # explicit >0 guard: a 0.0 calib_sec from a pathological capture is
    # "unusable", not "missing", and must never reach the division
    if co is not None and cn is not None and co > 0 and cn > 0:
        print(
            f"  calib: old={co}s new={cn}s machine={cn / co:.3f}x -> "
            f"normalized ratio={(sn / so) * (co / cn):.3f}"
        )
    else:
        missing = [
            t
            for t, c in (("old", co), ("new", cn))
            if c is None or not c > 0
        ]
        print(f"  calib_sec missing in: {', '.join(missing)} — raw ratio only")
    if key == "queries_isolated":
        eo = (old.get("isolated_n_groups"), new.get("isolated_n_groups"))
        if eo[0] != eo[1]:
            print(
                f"WARNING: different N_GROUPS eras {eo} — isolated "
                "numbers are NOT comparable across a re-bucket"
            )
        for rec, tag in ((old, "old"), (new, "new")):
            if rec.get("isolated_groups_skipped"):
                print(
                    f"WARNING: {tag} capture is PARTIAL "
                    f"({rec['isolated_groups_skipped']} groups skipped)"
                )
    movers = sorted(inter, key=lambda n: qn[n] / max(qo[n], 1e-9))
    fmt = lambda n: f"{n}: {qo[n]:.3f} -> {qn[n]:.3f} ({qn[n]/max(qo[n],1e-9):.2f}x)"
    print("\nbiggest improvements:")
    for n in movers[:8]:
        print("  " + fmt(n))
    print("\nbiggest regressions:")
    for n in movers[-8:][::-1]:
        print("  " + fmt(n))
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print("\nnew queries:", ", ".join(f"{n}={qn[n]:.3f}s" for n in only_new))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
