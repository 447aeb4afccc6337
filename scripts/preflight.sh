#!/usr/bin/env bash
# Round-end snapshot gate: refuse to commit a tree that does not
# compile. Run this (or `make` it a habit) IMMEDIATELY before any
# end-of-round / snapshot commit — round 9 lost its entire official
# record (empty CORRECTNESS, rc=1 BENCH) to a snapshot commit whose
# last 4 files had never seen the compiler.
#
# Usage:
#   scripts/preflight.sh          # compile gate only (~seconds, incremental)
#   scripts/preflight.sh --test   # compile + full sbt test (~9 min)
#
# Exit code 0 = safe to commit. Anything else = DO NOT COMMIT.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt Test/compile (main + test sources)..."
sbt -batch Test/compile >/tmp/preflight_compile.log 2>&1 || {
  echo "[preflight] COMPILE FAILED — do not commit. Tail of log:"
  tail -30 /tmp/preflight_compile.log
  exit 1
}
echo "[preflight] compile OK"

# Every public operator must be referenced by a spec or a catalog query:
# unwired code is dead weight that has already broken one round.
echo "[preflight] checking for unreferenced operator symbols..."
python3 - <<'EOF'
import re, pathlib, sys
root = pathlib.Path("src/main/scala/graft")
test = pathlib.Path("src/test/scala/graft")
defs = {}
for f in list(root.glob("operators/*.scala")):
    for m in re.finditer(r"^\s*def ([a-zA-Z0-9_]+)\(", f.read_text(), re.M):
        name = m.group(1)
        if name[0].isupper() or name.startswith("_"):
            continue
        defs.setdefault(name, f)
refs = ""
for f in list(root.glob("**/*.scala")) + list(test.glob("**/*.scala")):
    refs += f.read_text()
orphans = []
for name, f in sorted(defs.items()):
    # referenced anywhere beyond its own `def` line? (intra-file helper
    # use counts — the target is operators wired to NOTHING)
    uses = len(re.findall(r"\b%s\b" % re.escape(name), refs))
    if uses <= 1:
        orphans.append(f"{f}:{name}")
if orphans:
    print("[preflight] UNREFERENCED public operators (wire a spec/query or revert):")
    print("\n".join("  " + o for o in orphans))
    sys.exit(1)
print("[preflight] no orphan operators")
EOF

if [[ "${1:-}" == "--test" ]]; then
  echo "[preflight] sbt test (full suite)..."
  sbt -batch test >/tmp/preflight_test.log 2>&1 || {
    echo "[preflight] TESTS FAILED — do not commit. Tail of log:"
    tail -30 /tmp/preflight_test.log
    exit 1
  }
  tail -5 /tmp/preflight_test.log
fi
echo "[preflight] OK to commit"
