"""Legacy MaxMind GeoIP ``.dat`` (City edition) reader + fixture writer.

The reference's third backend (``lib/fluent/plugin/filter_geoip.rb:204-207``,
``backend_library geoip``) opens a legacy GeoIP City ``.dat`` database via
the Ruby ``geoip`` gem -- a third of its test matrix
(``test/plugin/test_filter_geoip.rb:818-1217``) runs against that format.
This module implements the format in pure Python from public knowledge of
the (EOL, openly documented) GeoIP legacy layout, mirroring how
:mod:`.mmdb` implements the MaxMind DB spec: a deterministic fixture
WRITER so the binary-trie execution path runs for real in this sandbox,
and a READER with the same flat-key doc contract as
``fixture.fixture_flat_docs("geoip")``.

Format summary (City Edition Rev0/Rev1, IPv4):

* The file starts with a binary trie: ``segments`` nodes of two 3-byte
  little-endian records each, walked MSB-first over the 32-bit address.
  A record value ``< segments`` is the next node; ``== segments`` is a
  miss; ``> segments`` is a data pointer ``p`` whose file offset is
  ``p + (2*3 - 1) * segments``.
* A data record is: country index (1 byte, into the static libGeoIP
  country table), region, city, postal code (NUL-terminated latin-1
  strings), latitude and longitude (3-byte LE integers,
  ``value/10000 - 180``), and -- Rev1, US only -- a 3-byte combined
  metro/area code (``dma = v // 1000``, ``area = v % 1000``).
* The file ends with a structure block found by scanning backward from
  EOF: three ``0xFF`` bytes, the edition type byte (City Rev0 = 6,
  Rev1 = 2), then ``segments`` as a 3-byte LE integer.

Honesty notes: IPv4 editions only (the v6 editions are out of scope);
lat/lon carry the format's intrinsic 4-decimal precision, so values
differ in the 5th decimal from the GeoIP2-precision flat fixture (the
reference's own legacy backend has the same precision gap vs GeoIP2);
the country table ordering follows the public libGeoIP table -- fixture
round-trips pin reader==writer, and the table is exercised only for the
codes a database actually stores.
"""

from __future__ import annotations

import os
import struct

# (iso2, iso3, name) in libGeoIP index order (public table; index 0 is the
# "no country" sentinel).  Only indices referenced by a database matter at
# lookup time; the fixture writer resolves codes through this same table.
_COUNTRIES: list[tuple[str, str, str]] = [
    ("--", "--", "N/A"), ("AP", "AP", "Asia/Pacific Region"),
    ("EU", "EU", "Europe"), ("AD", "AND", "Andorra"),
    ("AE", "ARE", "United Arab Emirates"), ("AF", "AFG", "Afghanistan"),
    ("AG", "ATG", "Antigua and Barbuda"), ("AI", "AIA", "Anguilla"),
    ("AL", "ALB", "Albania"), ("AM", "ARM", "Armenia"),
    ("CW", "CUW", "Curacao"), ("AO", "AGO", "Angola"),
    ("AQ", "ATA", "Antarctica"), ("AR", "ARG", "Argentina"),
    ("AS", "ASM", "American Samoa"), ("AT", "AUT", "Austria"),
    ("AU", "AUS", "Australia"), ("AW", "ABW", "Aruba"),
    ("AZ", "AZE", "Azerbaijan"), ("BA", "BIH", "Bosnia and Herzegovina"),
    ("BB", "BRB", "Barbados"), ("BD", "BGD", "Bangladesh"),
    ("BE", "BEL", "Belgium"), ("BF", "BFA", "Burkina Faso"),
    ("BG", "BGR", "Bulgaria"), ("BH", "BHR", "Bahrain"),
    ("BI", "BDI", "Burundi"), ("BJ", "BEN", "Benin"),
    ("BM", "BMU", "Bermuda"), ("BN", "BRN", "Brunei Darussalam"),
    ("BO", "BOL", "Bolivia"), ("BR", "BRA", "Brazil"),
    ("BS", "BHS", "Bahamas"), ("BT", "BTN", "Bhutan"),
    ("BV", "BVT", "Bouvet Island"), ("BW", "BWA", "Botswana"),
    ("BY", "BLR", "Belarus"), ("BZ", "BLZ", "Belize"),
    ("CA", "CAN", "Canada"), ("CC", "CCK", "Cocos (Keeling) Islands"),
    ("CD", "COD", "Congo, The Democratic Republic of the"),
    ("CF", "CAF", "Central African Republic"), ("CG", "COG", "Congo"),
    ("CH", "CHE", "Switzerland"), ("CI", "CIV", "Cote D'Ivoire"),
    ("CK", "COK", "Cook Islands"), ("CL", "CHL", "Chile"),
    ("CM", "CMR", "Cameroon"), ("CN", "CHN", "China"),
    ("CO", "COL", "Colombia"), ("CR", "CRI", "Costa Rica"),
    ("CU", "CUB", "Cuba"), ("CV", "CPV", "Cape Verde"),
    ("CX", "CXR", "Christmas Island"), ("CY", "CYP", "Cyprus"),
    ("CZ", "CZE", "Czech Republic"), ("DE", "DEU", "Germany"),
    ("DJ", "DJI", "Djibouti"), ("DK", "DNK", "Denmark"),
    ("DM", "DMA", "Dominica"), ("DO", "DOM", "Dominican Republic"),
    ("DZ", "DZA", "Algeria"), ("EC", "ECU", "Ecuador"),
    ("EE", "EST", "Estonia"), ("EG", "EGY", "Egypt"),
    ("EH", "ESH", "Western Sahara"), ("ER", "ERI", "Eritrea"),
    ("ES", "ESP", "Spain"), ("ET", "ETH", "Ethiopia"),
    ("FI", "FIN", "Finland"), ("FJ", "FJI", "Fiji"),
    ("FK", "FLK", "Falkland Islands (Malvinas)"),
    ("FM", "FSM", "Micronesia, Federated States of"),
    ("FO", "FRO", "Faroe Islands"), ("FR", "FRA", "France"),
    ("SX", "SXM", "Sint Maarten (Dutch part)"), ("GA", "GAB", "Gabon"),
    ("GB", "GBR", "United Kingdom"), ("GD", "GRD", "Grenada"),
    ("GE", "GEO", "Georgia"), ("GF", "GUF", "French Guiana"),
    ("GH", "GHA", "Ghana"), ("GI", "GIB", "Gibraltar"),
    ("GL", "GRL", "Greenland"), ("GM", "GMB", "Gambia"),
    ("GN", "GIN", "Guinea"), ("GP", "GLP", "Guadeloupe"),
    ("GQ", "GNQ", "Equatorial Guinea"), ("GR", "GRC", "Greece"),
    ("GS", "SGS", "South Georgia and the South Sandwich Islands"),
    ("GT", "GTM", "Guatemala"), ("GU", "GUM", "Guam"),
    ("GW", "GNB", "Guinea-Bissau"), ("GY", "GUY", "Guyana"),
    ("HK", "HKG", "Hong Kong"),
    ("HM", "HMD", "Heard Island and McDonald Islands"),
    ("HN", "HND", "Honduras"), ("HR", "HRV", "Croatia"),
    ("HT", "HTI", "Haiti"), ("HU", "HUN", "Hungary"),
    ("ID", "IDN", "Indonesia"), ("IE", "IRL", "Ireland"),
    ("IL", "ISR", "Israel"), ("IN", "IND", "India"),
    ("IO", "IOT", "British Indian Ocean Territory"),
    ("IQ", "IRQ", "Iraq"), ("IR", "IRN", "Iran, Islamic Republic of"),
    ("IS", "ISL", "Iceland"), ("IT", "ITA", "Italy"),
    ("JM", "JAM", "Jamaica"), ("JO", "JOR", "Jordan"),
    ("JP", "JPN", "Japan"), ("KE", "KEN", "Kenya"),
    ("KG", "KGZ", "Kyrgyzstan"), ("KH", "KHM", "Cambodia"),
    ("KI", "KIR", "Kiribati"), ("KM", "COM", "Comoros"),
    ("KN", "KNA", "Saint Kitts and Nevis"),
    ("KP", "PRK", "Korea, Democratic People's Republic of"),
    ("KR", "KOR", "Korea, Republic of"), ("KW", "KWT", "Kuwait"),
    ("KY", "CYM", "Cayman Islands"), ("KZ", "KAZ", "Kazakhstan"),
    ("LA", "LAO", "Lao People's Democratic Republic"),
    ("LB", "LBN", "Lebanon"), ("LC", "LCA", "Saint Lucia"),
    ("LI", "LIE", "Liechtenstein"), ("LK", "LKA", "Sri Lanka"),
    ("LR", "LBR", "Liberia"), ("LS", "LSO", "Lesotho"),
    ("LT", "LTU", "Lithuania"), ("LU", "LUX", "Luxembourg"),
    ("LV", "LVA", "Latvia"), ("LY", "LBY", "Libya"),
    ("MA", "MAR", "Morocco"), ("MC", "MCO", "Monaco"),
    ("MD", "MDA", "Moldova, Republic of"), ("MG", "MDG", "Madagascar"),
    ("MH", "MHL", "Marshall Islands"), ("MK", "MKD", "Macedonia"),
    ("ML", "MLI", "Mali"), ("MM", "MMR", "Myanmar"),
    ("MN", "MNG", "Mongolia"), ("MO", "MAC", "Macau"),
    ("MP", "MNP", "Northern Mariana Islands"),
    ("MQ", "MTQ", "Martinique"), ("MR", "MRT", "Mauritania"),
    ("MS", "MSR", "Montserrat"), ("MT", "MLT", "Malta"),
    ("MU", "MUS", "Mauritius"), ("MV", "MDV", "Maldives"),
    ("MW", "MWI", "Malawi"), ("MX", "MEX", "Mexico"),
    ("MY", "MYS", "Malaysia"), ("MZ", "MOZ", "Mozambique"),
    ("NA", "NAM", "Namibia"), ("NC", "NCL", "New Caledonia"),
    ("NE", "NER", "Niger"), ("NF", "NFK", "Norfolk Island"),
    ("NG", "NGA", "Nigeria"), ("NI", "NIC", "Nicaragua"),
    ("NL", "NLD", "Netherlands"), ("NO", "NOR", "Norway"),
    ("NP", "NPL", "Nepal"), ("NR", "NRU", "Nauru"),
    ("NU", "NIU", "Niue"), ("NZ", "NZL", "New Zealand"),
    ("OM", "OMN", "Oman"), ("PA", "PAN", "Panama"),
    ("PE", "PER", "Peru"), ("PF", "PYF", "French Polynesia"),
    ("PG", "PNG", "Papua New Guinea"), ("PH", "PHL", "Philippines"),
    ("PK", "PAK", "Pakistan"), ("PL", "POL", "Poland"),
    ("PM", "SPM", "Saint Pierre and Miquelon"),
    ("PN", "PCN", "Pitcairn Islands"), ("PR", "PRI", "Puerto Rico"),
    ("PS", "PSE", "Palestinian Territory"), ("PT", "PRT", "Portugal"),
    ("PW", "PLW", "Palau"), ("PY", "PRY", "Paraguay"),
    ("QA", "QAT", "Qatar"), ("RE", "REU", "Reunion"),
    ("RO", "ROU", "Romania"), ("RU", "RUS", "Russian Federation"),
    ("RW", "RWA", "Rwanda"), ("SA", "SAU", "Saudi Arabia"),
    ("SB", "SLB", "Solomon Islands"), ("SC", "SYC", "Seychelles"),
    ("SD", "SDN", "Sudan"), ("SE", "SWE", "Sweden"),
    ("SG", "SGP", "Singapore"), ("SH", "SHN", "Saint Helena"),
    ("SI", "SVN", "Slovenia"), ("SJ", "SJM", "Svalbard and Jan Mayen"),
    ("SK", "SVK", "Slovakia"), ("SL", "SLE", "Sierra Leone"),
    ("SM", "SMR", "San Marino"), ("SN", "SEN", "Senegal"),
    ("SO", "SOM", "Somalia"), ("SR", "SUR", "Suriname"),
    ("ST", "STP", "Sao Tome and Principe"), ("SV", "SLV", "El Salvador"),
    ("SY", "SYR", "Syrian Arab Republic"), ("SZ", "SWZ", "Swaziland"),
    ("TC", "TCA", "Turks and Caicos Islands"), ("TD", "TCD", "Chad"),
    ("TF", "ATF", "French Southern Territories"), ("TG", "TGO", "Togo"),
    ("TH", "THA", "Thailand"), ("TJ", "TJK", "Tajikistan"),
    ("TK", "TKL", "Tokelau"), ("TM", "TKM", "Turkmenistan"),
    ("TN", "TUN", "Tunisia"), ("TO", "TON", "Tonga"),
    ("TL", "TLS", "Timor-Leste"), ("TR", "TUR", "Turkey"),
    ("TT", "TTO", "Trinidad and Tobago"), ("TV", "TUV", "Tuvalu"),
    ("TW", "TWN", "Taiwan"), ("TZ", "TZA", "Tanzania, United Republic of"),
    ("UA", "UKR", "Ukraine"), ("UG", "UGA", "Uganda"),
    ("UM", "UMI", "United States Minor Outlying Islands"),
    ("US", "USA", "United States"), ("UY", "URY", "Uruguay"),
    ("UZ", "UZB", "Uzbekistan"), ("VA", "VAT", "Holy See (Vatican City State)"),
    ("VC", "VCT", "Saint Vincent and the Grenadines"),
    ("VE", "VEN", "Venezuela"), ("VG", "VGB", "Virgin Islands, British"),
    ("VI", "VIR", "Virgin Islands, U.S."), ("VN", "VNM", "Vietnam"),
    ("VU", "VUT", "Vanuatu"), ("WF", "WLF", "Wallis and Futuna"),
    ("WS", "WSM", "Samoa"), ("YE", "YEM", "Yemen"),
    ("YT", "MYT", "Mayotte"), ("RS", "SRB", "Serbia"),
    ("ZA", "ZAF", "South Africa"), ("ZM", "ZMB", "Zambia"),
    ("ME", "MNE", "Montenegro"), ("ZW", "ZWE", "Zimbabwe"),
    ("A1", "A1", "Anonymous Proxy"), ("A2", "A2", "Satellite Provider"),
    ("O1", "O1", "Other"), ("AX", "ALA", "Aland Islands"),
    ("GG", "GGY", "Guernsey"), ("IM", "IMN", "Isle of Man"),
    ("JE", "JEY", "Jersey"), ("BL", "BLM", "Saint Barthelemy"),
    ("MF", "MAF", "Saint Martin"),
    ("BQ", "BES", "Bonaire, Saint Eustatius and Saba"),
    ("SS", "SSD", "South Sudan"),
]
_CODE_TO_INDEX = {c: i for i, (c, _, _) in enumerate(_COUNTRIES)}

_RECORD_LENGTH = 3
# edition type bytes (structure block); type >= 106 encodings subtract 105
CITY_EDITION_REV0 = 6
CITY_EDITION_REV1 = 2
_STRUCTURE_INFO_MAX_SIZE = 20
_US_INDEX = _CODE_TO_INDEX["US"]


def _ip4_to_int(address: str) -> int | None:
    parts = address.split(".")
    if len(parts) != 4:
        return None
    out = 0
    for p in parts:
        if not p.isdigit():
            return None
        v = int(p)
        if v > 255:
            return None
        out = (out << 8) | v
    return out


class DatReader:
    """Minimal legacy GeoIP City ``.dat`` reader (IPv4, Rev0/Rev1).

    The whole file is held in memory (legacy City databases are tens of
    MB; one reader per enrich actor, opened once in ``__init__`` -- the
    same lifecycle as :class:`..backends.MaxmindBackend`)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._buf = f.read()
        self._type, self._segments = self._setup_segments()
        if self._type not in (CITY_EDITION_REV0, CITY_EDITION_REV1):
            raise ValueError(
                f"{path}: unsupported legacy GeoIP edition type {self._type}"
                " (only City Rev0/Rev1 .dat files are supported)")

    def _setup_segments(self) -> tuple[int, int]:
        buf = self._buf
        n = len(buf)
        for i in range(_STRUCTURE_INFO_MAX_SIZE):
            pos = n - 3 - i
            if pos < 0:
                break
            if buf[pos:pos + 3] == b"\xff\xff\xff":
                dbtype = buf[pos + 3]
                if dbtype >= 106:
                    dbtype -= 105
                seg_bytes = buf[pos + 4:pos + 4 + _RECORD_LENGTH]
                if len(seg_bytes) < _RECORD_LENGTH:
                    raise ValueError("truncated .dat structure block")
                segments = int.from_bytes(seg_bytes, "little")
                return dbtype, segments
        raise ValueError("not a legacy GeoIP .dat file (no structure block)")

    def _seek_record(self, ipnum: int) -> int | None:
        buf, seg, recl = self._buf, self._segments, _RECORD_LENGTH
        offset = 0
        for depth in range(31, -1, -1):
            base = 2 * recl * offset
            if (ipnum >> depth) & 1:
                base += recl
            x = int.from_bytes(buf[base:base + recl], "little")
            if x >= seg:
                return x
            offset = x
        return None  # corrupt trie: ran out of bits without a leaf

    def record_by_addr(self, address: str) -> dict | None:
        """Flat legacy doc (the 9 GEOIP_KEYS) for an IPv4 string, or None
        on miss / non-IPv4 input (the gem returns nil for both)."""
        ipnum = _ip4_to_int(address)
        if ipnum is None:
            return None
        x = self._seek_record(ipnum)
        if x is None or x == self._segments:
            return None
        pos = x + (2 * _RECORD_LENGTH - 1) * self._segments
        buf = self._buf
        country_idx = buf[pos]
        pos += 1
        strings = []
        for _ in range(3):  # region, city, postal code
            end = buf.index(b"\x00", pos)
            strings.append(buf[pos:end].decode("latin-1") or None)
            pos = end + 1
        lat = int.from_bytes(buf[pos:pos + 3], "little") / 10000.0 - 180.0
        lon = int.from_bytes(buf[pos + 3:pos + 6], "little") / 10000.0 - 180.0
        pos += 6
        dma = area = None
        if self._type == CITY_EDITION_REV1 and country_idx == _US_INDEX:
            combo = int.from_bytes(buf[pos:pos + 3], "little")
            if combo:
                dma, area = combo // 1000, combo % 1000
        iso2, iso3, name = (_COUNTRIES[country_idx]
                            if country_idx < len(_COUNTRIES)
                            else ("--", "--", "N/A"))
        return {
            "city": strings[1],
            "latitude": lat,
            "longitude": lon,
            "country_code3": iso3 if iso2 != "--" else None,
            "country_code": iso2 if iso2 != "--" else None,
            "country_name": name if iso2 != "--" else None,
            "dma_code": dma,
            "area_code": area,
            "region": strings[0],
        }


# --------------------------------------------------------------------------
# fixture writer (mirrors state/mmdb.py's writer role: a deterministic,
# spec-shaped binary so the real parse path is exercised in tests)
# --------------------------------------------------------------------------

def _encode_record(doc: dict) -> bytes:
    code = doc.get("country_code") or "--"
    idx = _CODE_TO_INDEX.get(code)
    if idx is None:
        raise ValueError(f"unknown country code {code!r}")
    out = bytes([idx])
    for k in ("region", "city", "postal_code"):
        out += (doc.get(k) or "").encode("latin-1") + b"\x00"
    for k in ("latitude", "longitude"):
        v = doc.get(k)
        stored = int(round(((0.0 if v is None else float(v)) + 180.0) * 10000))
        if not 0 <= stored < (1 << 24):
            raise ValueError(f"{k}={v} out of .dat range")
        out += stored.to_bytes(3, "little")
    if code == "US":
        dma = int(doc.get("dma_code") or 0)
        area = int(doc.get("area_code") or 0)
        out += (dma * 1000 + area).to_bytes(3, "little")
    return out


def write_city_dat(path: str, networks: list[tuple[str, dict]],
                   info: str = "fluent_plugin_geoip_ray fixture") -> str:
    """Write a City Rev1 ``.dat`` mapping CIDR networks (``"a.b.c.d/len"``
    or bare IPs = /32) to flat legacy docs.  Deterministic for a given
    input order; identical docs share one data record."""
    # binary trie as a dict tree; leaves hold a data-record key
    root: dict = {}
    records: dict[bytes, int] = {}   # encoded record -> data offset
    data = bytearray(b"\x00")        # offset 0 is the never-referenced pad

    for net, doc in networks:
        if "/" in net:
            ip_s, plen_s = net.split("/")
            plen = int(plen_s)
        else:
            ip_s, plen = net, 32
        ipnum = _ip4_to_int(ip_s)
        if ipnum is None or not 0 < plen <= 32:
            raise ValueError(f"bad network {net!r}")
        enc = _encode_record(doc)
        if enc not in records:
            records[enc] = len(data)
            data.extend(enc)
        node = root
        for depth in range(31, 32 - plen, -1):
            bit = (ipnum >> depth) & 1
            child = node.get(bit)
            if isinstance(child, tuple):
                raise ValueError(f"{net}: nested inside an already-inserted"
                                 " broader network")
            node = node.setdefault(bit, {})
        leaf_bit = (ipnum >> (32 - plen)) & 1
        if isinstance(node.get(leaf_bit), dict) and node[leaf_bit]:
            raise ValueError(f"{net}: overlaps a more-specific network")
        node[leaf_bit] = ("data", records[enc])

    # assign node indices breadth-first so child indices are compact
    nodes: list[dict] = []

    def visit(node: dict) -> int:
        idx = len(nodes)
        nodes.append(node)
        for bit in (0, 1):
            child = node.get(bit)
            if isinstance(child, dict):
                node[bit] = ("node", visit(child))
        return idx

    visit(root)
    segments = len(nodes)

    def record_value(entry) -> int:
        if entry is None:
            return segments                       # miss sentinel
        kind, v = entry
        if kind == "node":
            return v
        return segments + v                       # data pointer (offset >= 1)

    out = bytearray()
    for node in nodes:
        for bit in (0, 1):
            out += record_value(node.get(bit)).to_bytes(3, "little")
    out += data
    out += b"\x00" * 3 + info.encode("latin-1")   # database-info block
    out += b"\xff\xff\xff" + bytes([CITY_EDITION_REV1])
    out += segments.to_bytes(3, "little")

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)
    return path


def dat_fixture_networks() -> list[tuple[str, dict]]:
    """The canonical fixture IPs as /32 networks with legacy flat docs
    (same truth as ``fixture.fixture_flat_docs('geoip')``, at the .dat
    format's intrinsic 4-decimal lat/lon precision)."""
    from .fixture import fixture_flat_docs

    docs = fixture_flat_docs("geoip")
    nets = []
    for ip, doc in docs.items():
        if _ip4_to_int(ip) is None:
            continue  # host tokens resolve via DNS in the gem; not in a .dat
        nets.append((ip, doc))
    return nets


def ensure_fixture_dat(path: str) -> str:
    """Idempotently write the fixture .dat (scratch path convention shared
    with the mmdb fixture)."""
    if not os.path.exists(path):
        write_city_dat(path, dat_fixture_networks())
    return path
