"""Debug CLI: dump the raw lookup result for one address.

Analog of the reference's ``utils/dump.rb`` (``utils/dump.rb:8-27``, usage
``README.md:279-285``): ``python -m fluent_plugin_geoip_ray.dump <address>
[backend_style]`` pretty-prints the backend document (fixture backend in this
sandbox; pass a database path as third arg -- ``.mmdb`` opens
MaxmindBackend, ``.dat`` opens the bundled legacy City reader).  No Ray
session needed.
"""

from __future__ import annotations

import json
import sys

from .state.backends import DictBackend, LegacyDatBackend, MaxmindBackend
from .state.fixture import fixture_flat_docs


def main(argv: list[str]) -> int:
    if not argv:
        print(
            "usage: python -m fluent_plugin_geoip_ray.dump <address> "
            "[geoip2_c|geoip2_compat|geoip] [db_path(.mmdb|.dat)]",
            file=sys.stderr,
        )
        return 2
    address = argv[0]
    style = argv[1] if len(argv) > 1 else "geoip2_c"
    if len(argv) > 2:
        backend = (LegacyDatBackend(argv[2]) if argv[2].endswith(".dat")
                   else MaxmindBackend(argv[2]))
    elif style == "geoip2_c":
        backend = DictBackend()
    else:
        backend = DictBackend(fixture_flat_docs(style))
    doc = backend.lookup(address)
    print(json.dumps(doc, indent=2, sort_keys=True))
    return 0 if doc is not None else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
