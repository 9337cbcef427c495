"""Network-flow processors: community_id.

Community ID flow hash (``libbeat/processors/communityid/``,
``libbeat/common/flowhash/communityid.go``; the public Corelight
community-id spec): ``"1:" + base64(sha1(seed_be16 | src_ip | dst_ip |
proto | 0x00 [| src_port_be16 | dst_port_be16]))`` over the
canonically-ordered 5-tuple. Ports participate for TCP/UDP/SCTP and the
ICMP type/code port-equivalents; the endpoint pair sorts so
``(src_ip, src_port) <= (dst_ip, dst_port)`` unless the ICMP message is
one-way. Per-row python (hash + ip parse per event) like the reference's
per-event Run — an enrichment-rate field, not a hot parse path.
"""

from __future__ import annotations

import base64
import hashlib
import ipaddress
import struct

import pyarrow as pa

from ..errors import ConfigError
from . import Processor, get_column, register, set_column

_TRANSPORTS = {"icmp": 1, "igmp": 2, "tcp": 6, "udp": 17, "gre": 47,
               "icmp6": 58, "ipv6-icmp": 58, "icmpv6": 58, "sctp": 132}

# flowhash/flow.go:56-88 — bidirectional ICMP type equivalents
_ICMP4_EQUIV = {8: 0, 0: 8, 13: 14, 14: 13, 15: 16, 10: 9, 9: 10,
                17: 18, 18: 17}
_ICMP6_EQUIV = {128: 129, 129: 128, 133: 134, 134: 133, 135: 136,
                136: 135, 130: 131, 131: 130, 139: 140, 140: 139,
                144: 145, 145: 144}


def community_id_hash(src_ip: str, dst_ip: str, proto: int,
                      src_port: int | None = None,
                      dst_port: int | None = None,
                      icmp_type: int | None = None,
                      icmp_code: int | None = None,
                      seed: int = 0) -> str | None:
    """One flow → community id; None when the tuple is invalid."""
    try:
        sip = ipaddress.ip_address(src_ip).packed
        dip = ipaddress.ip_address(dst_ip).packed
    except (ValueError, TypeError):
        return None
    sp, dp = src_port, dst_port
    if proto in (1, 58):  # ICMP: type/code → port equivalents
        table = _ICMP4_EQUIV if proto == 1 else _ICMP6_EQUIV
        t = icmp_type or 0
        c = icmp_code or 0
        equiv = table.get(t)
        one_way = equiv is None
        sp, dp = t, (equiv if equiv is not None else c)
        if not one_way and (sip, sp) > (dip, dp):
            sip, dip, sp, dp = dip, sip, dp, sp
    elif proto in (6, 17, 132):
        if sp is None or dp is None or not (1 <= sp <= 65535) \
                or not (1 <= dp <= 65535):
            return None
        if (sip, sp) > (dip, dp):
            sip, dip, sp, dp = dip, sip, dp, sp
    else:
        sp = dp = None
        if sip > dip:
            sip, dip = dip, sip
    h = hashlib.sha1()
    h.update(struct.pack(">H", seed))
    h.update(sip)
    h.update(dip)
    h.update(struct.pack("BB", proto, 0))
    if sp is not None:
        h.update(struct.pack(">HH", sp, dp))
    return "1:" + base64.b64encode(h.digest()).decode("ascii")


def _to_proto(v) -> int | None:
    if v is None:
        return None
    if isinstance(v, (int, float)):
        return int(v)
    s = str(v)
    if s.isdigit():
        return int(s)
    return _TRANSPORTS.get(s) or _TRANSPORTS.get(s.lower())


@register("translate_sid")
class TranslateSid(Processor):
    """Windows SID → account name/type/domain
    (``processors/translate_sid/``). The reference resolves through the
    host OS's LookupAccountSid; a cluster engine has no Windows account
    store, so the directory arrives as DATA: ``accounts`` rows (or an
    ``accounts_parquet`` side table) with columns
    ``sid, account_name, account_type, domain`` — the same
    broadcast-dictionary shape as every other lookup enrich (documented
    divergence; resolution semantics, config surface and per-row
    miss/failure behavior follow the reference,
    ``translate_sid/config.go:22-37``)."""

    def __init__(self, field: str, account_name_target: str = "",
                 account_type_target: str = "", domain_target: str = "",
                 ignore_missing: bool = False, ignore_failure: bool = False,
                 accounts: list[dict] | None = None,
                 accounts_parquet: str | None = None):
        if not (account_name_target or account_type_target
                or domain_target):
            raise ConfigError(
                "translate_sid: at least one target field must be "
                "configured (account_name_target, account_type_target, "
                "and/or domain_target)")
        side = accounts
        if accounts_parquet:
            import pyarrow.parquet as pq
            side = pq.read_table(accounts_parquet).to_pylist()
        if not side:
            raise ConfigError(
                "translate_sid: this engine resolves SIDs from a "
                "provided account table (accounts/accounts_parquet) — "
                "there is no OS account store on a cluster")
        self.index = {r["sid"]: r for r in side}
        self.field = field
        self.targets = [(t, k) for t, k in
                        ((account_name_target, "account_name"),
                         (account_type_target, "account_type"),
                         (domain_target, "domain")) if t]
        self.ignore_missing = ignore_missing
        self.ignore_failure = ignore_failure

    def apply(self, tbl: pa.Table) -> pa.Table:
        col = get_column(tbl, self.field)
        if col is None:
            if self.ignore_missing:
                return tbl
            raise ConfigError(f"translate_sid: missing {self.field!r}")
        sids = col.to_pylist()
        misses = [s for s in sids
                  if s is not None and s not in self.index]
        if misses and not self.ignore_failure:
            raise ValueError(
                f"translate_sid: {len(misses)} unresolvable SID(s), "
                f"e.g. {misses[0]!r} (ignore_failure=false)")
        for target, key in self.targets:
            vals = [None if s is None else
                    (self.index.get(s) or {}).get(key) for s in sids]
            tbl = set_column(tbl, target, pa.array(vals, pa.string()))
        return tbl


@register("community_id")
class CommunityId(Processor):
    """ECS-default field wiring (``communityid/config.go:40-50``):
    source.ip/port, destination.ip/port, network.iana_number then
    network.transport, icmp.type/code → ``network.community_id``."""

    def __init__(self, fields: dict | None = None,
                 target: str = "network.community_id", seed: int = 0):
        f = fields or {}
        self.src_ip = f.get("source_ip", "source.ip")
        self.src_port = f.get("source_port", "source.port")
        self.dst_ip = f.get("destination_ip", "destination.ip")
        self.dst_port = f.get("destination_port", "destination.port")
        self.iana = f.get("iana_number", "network.iana_number")
        self.transport = f.get("transport", "network.transport")
        self.icmp_type = f.get("icmp_type", "icmp.type")
        self.icmp_code = f.get("icmp_code", "icmp.code")
        self.target = target
        self.seed = int(seed)

    def _col(self, tbl: pa.Table, name: str) -> list:
        col = get_column(tbl, name)
        return col.to_pylist() if col is not None else [None] * tbl.num_rows

    def apply(self, tbl: pa.Table) -> pa.Table:
        sips = self._col(tbl, self.src_ip)
        dips = self._col(tbl, self.dst_ip)
        sps = self._col(tbl, self.src_port)
        dps = self._col(tbl, self.dst_port)
        ianas = self._col(tbl, self.iana)
        trans = self._col(tbl, self.transport)
        itypes = self._col(tbl, self.icmp_type)
        icodes = self._col(tbl, self.icmp_code)
        out = []
        for sip, dip, sp, dp, ia, tr, it, ic in zip(
                sips, dips, sps, dps, ianas, trans, itypes, icodes):
            proto = _to_proto(ia if ia is not None else tr)
            if sip is None or dip is None or proto is None:
                out.append(None)
                continue
            out.append(community_id_hash(
                sip, dip, proto,
                src_port=None if sp is None else int(sp),
                dst_port=None if dp is None else int(dp),
                icmp_type=None if it is None else int(it),
                icmp_code=None if ic is None else int(ic),
                seed=self.seed))
        return set_column(tbl, self.target, pa.array(out, pa.string()))
