"""Shared extraction regexes.

One source of truth for both the Ray parse stage (``pyarrow.compute``'s RE2)
and the DuckDB oracle SQL (also RE2) so the two engines agree token-for-token
(driver correctness gate, ``__ray_entry__.oracle_sql``).
"""

# an IPv4-shaped token; transcripts embed IPs space-delimited so this simple
# form matches identically in pyarrow (RE2) and DuckDB (RE2)
IPV4 = r"(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})"
IPV4_NAMED = r"(?P<ip>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})"

# host tokens resolvable via the fixture alias table (FIXTURES.md §2)
HOST = r"(host_[a-z]+)"
HOST_NAMED = r"(?P<host>host_[a-z]+)"

# simplified IPv6 token (well-formed colon-hex groups incl. "::" forms);
# identical RE2 semantics in pyarrow and DuckDB
IPV6 = r"(?:[0-9a-fA-F]{1,4}:){2,7}[0-9a-fA-F:]*[0-9a-fA-F]{1,4}|(?:[0-9a-fA-F]{1,4}:){1,7}:"
IPV6_NAMED = r"(?P<ip6>" + IPV6 + r")"
