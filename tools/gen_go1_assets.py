"""One-time generator for the bundled Go1 robot assets.

Reads the upstream Unitree Go1 MJCF scene files (robot description data
originally from the MuJoCo Menagerie, BSD-licensed) through our own parser
and writes the defaults-resolved RawSpec JSON into quadruped_tpu/assets/.
The JSON files are the canonical assets of this framework; XML is only ever
re-generated from them (for the mujoco test oracle and offline rendering).

Usage: python tools/gen_go1_assets.py [path-to-unitree_go1-dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from quadruped_tpu.mjcf import parse_raw, load_mjcf  # noqa: E402

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/unitree_go1")
DST = Path(__file__).resolve().parents[1] / "quadruped_tpu" / "assets"


def main():
    for ctrl in ("torque", "position"):
        spec = parse_raw(load_mjcf(str(SRC / f"scene_{ctrl}.xml")))
        out = DST / f"go1_{ctrl}.json"
        out.write_text(spec.to_json())
        print(f"wrote {out}: {len(spec.bodies)} bodies, {len(spec.joints)} joints, "
              f"{len(spec.geoms)} geoms, {len(spec.actuators)} actuators")


if __name__ == "__main__":
    main()
