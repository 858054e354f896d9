"""kapture -> MSLS prediction-format converter (reference
training_tools/convert_kapture_to_msls.py): regroups 'query,ref' CSV lines
into 'query ref1 ref2 ...' lines keyed by image stem."""

from __future__ import annotations

import sys
from collections import OrderedDict


def convert(infilename: str, outfilename: str) -> None:
    query_ref_map: "OrderedDict[str, list]" = OrderedDict()
    with open(infilename) as infile:
        for line in infile:
            if line.startswith("#"):
                continue
            query_with_path, ref_with_path = line.split(",")
            q = query_with_path[query_with_path.rfind("/") + 1 : query_with_path.find(".jpg")]
            r = ref_with_path[ref_with_path.rfind("/") + 1 : ref_with_path.find(".jpg")]
            query_ref_map.setdefault(q, []).append(r)
    with open(outfilename, "w") as out:
        for q, refs in query_ref_map.items():
            out.write(f"{q} {' '.join(refs)}\n")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
