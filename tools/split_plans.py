#!/usr/bin/env python3
"""Split graft.tools.PlanAudit stdout into per-query plan files.

Usage: split_plans.py AUDIT_OUT_FILE DEST_DIR SUFFIX
Writes DEST_DIR/<query>_<SUFFIX>.txt for every
"================ <query> ================" section.
"""
import re
import sys
import os


def main():
    src, dest, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    os.makedirs(dest, exist_ok=True)
    name, buf = None, []
    def flush():
        if name and buf:
            with open(os.path.join(dest, f"{name}_{suffix}.txt"), "w") as f:
                f.write("".join(buf).strip() + "\n")
    with open(src) as f:
        for line in f:
            m = re.match(r"^={16} (\S+) ={16}\s*$", line)
            if m:
                flush()
                name, buf = m.group(1), []
            elif name:
                buf.append(line)
    flush()


if __name__ == "__main__":
    main()
