"""Generate the committed fixture diagnostic tree (tests/fixtures/diag1).

Deterministic miniature of the reference's input layout
(/root/reference/README.md:129-147): 4 nodes in 2 DCs, exercising the
parser edge cases the reference handles:

- node dir named by IP, by hostname with ``_`` and ``-`` separators
  (explore.py:606-609), and one pure hostname resolved via gossipinfo
  (explore.py:251-263);
- ``tablestats`` fallback when ``cfstats`` is absent (explore.py:900-903);
- legacy ``Column Family:`` label and ``Table (index):``
  (explore.py:923-931);
- zip-compressed system.log (explore.py:311-316);
- gossipinfo embedded JSON workload payload (explore.py:692-706);
- proxyhistograms missing for one node (explore.py:1494-1509);
- schema with per-DC NTS replication, SimpleStrategy, INDEX, CUSTOM
  INDEX (SAI), MATERIALIZED VIEW, TYPE, UDF, UDA (explore.py:744-874).

Run: ``python tests/fixtures/gen_diag.py`` (idempotent).
"""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "diag1", "nodes")

IPS = ["10.1.0.1", "10.1.0.2", "10.2.0.1", "10.2.0.2"]
DIRS = ["10.1.0.1", "10_1_0_2", "10-2-0-1", "nodeh4"]  # name styles
DCS = {"10.1.0.1": "dc1", "10.1.0.2": "dc1", "10.2.0.1": "dc2", "10.2.0.2": "dc2"}
RACKS = {"10.1.0.1": "rack1", "10.1.0.2": "rack2", "10.2.0.1": "rack1", "10.2.0.2": "rack2"}
UPTIME = {"10.1.0.1": 86400, "10.1.0.2": 172800, "10.2.0.1": 43200, "10.2.0.2": 86400}


def status_text() -> str:
    out = []
    for dc in ("dc1", "dc2"):
        out += [
            f"Datacenter: {dc}",
            "=" * 15,
            "Status=Up/Down",
            "|/ State=Normal/Leaving/Joining/Moving",
            "--  Address    Load       Tokens       Owns (effective)  Host ID                               Rack",
        ]
        for ip in IPS:
            if DCS[ip] == dc:
                n = int(ip.split(".")[-1])
                out.append(
                    f"UN  {ip}  {100 + n}.25 KiB  16           50.0%             "
                    f"00000000-0000-0000-0000-00000000000{n}  {RACKS[ip]}"
                )
        if dc == "dc2":
            # a status row with no node directory → 'Missing Node
            # Data' warning (explore.py:302-304)
            out.append(
                "DN  10.9.9.9  0.00 KiB  16           0.0%              "
                "00000000-0000-0000-0000-000000000099  rack9"
            )
        out.append("")
    return "\n".join(out) + "\n"


def gossip_text() -> str:
    out = []
    for ip in IPS:
        # The hostname-only node's endpoint line carries hostname/ip —
        # the form find_ip_addr (explore.py:251-263) resolves against.
        prefix = "nodeh4" if ip == "10.2.0.2" else ""
        out += [
            f"{prefix}/{ip}",
            "  generation:1673973240",
            "  heartbeat:273756",
            "  STATUS:16:NORMAL,-9223372036854775808",
            f"  DC:8:{DCS[ip]}",
            f"  RACK:10:{RACKS[ip]}",
            "  RELEASE_VERSION:4:4.0.7",
        ]
        if ip == "10.2.0.2":  # one DSE node exercises the JSON payload
            out.append(
                '  X_11_PADDING:10:{"workload":"Search","active":"true",'
                '"graph":true,"dse_version":"6.8.25"}'
            )
    return "\n".join(out) + "\n"


def info_text(ip: str) -> str:
    return "\n".join([
        "ID                     : 00000000-0000-0000-0000-000000000000",
        "Gossip active          : true",
        f"Uptime (seconds)       : {UPTIME[ip]}",
        f"Data Center            : {DCS[ip]}",
        f"Rack                   : {RACKS[ip]}",
        "Exceptions             : 0",
    ]) + "\n"


def cfstats_text(ip: str, legacy: bool = False) -> str:
    """Two keyspaces (one system, one app) with per-table metric blocks."""
    n = int(ip.split(".")[-1]) + (10 if ip.startswith("10.2") else 0)
    tbl_label = "Column Family" if legacy else "Table"
    out = ["Total number of tables: 47", "----------------"]
    for ks, tables in (
        ("system", ["local"]),
        ("shop", ["orders", "users"]),
        ("media", ["assets"]),
    ):
        out.append(f"Keyspace : {ks}" if not legacy else f"Keyspace: {ks}")
        out += [
            f"\tRead Count: {1000 * n}",
            f"\tWrite Count: {2000 * n}",
        ]
        for i, tbl in enumerate(tables):
            out += [
                f"\t\t{tbl_label}: {tbl}",
                f"\t\tSSTable count: {4 + i + n % 3}",
                f"\t\tSpace used (live): {1000000 * (n + i)}",
                f"\t\tSpace used (total): {1100000 * (n + i)}",
                f"\t\tCompacted partition maximum bytes: {110000000 + 10000000 * i}",
                f"\t\tLocal read count: {100 * (n + i)}",
                f"\t\tLocal read latency: {10.5 + i} ms",
                f"\t\tLocal write count: {200 * (n + i)}",
                f"\t\tLocal write latency: {5.25 + i} ms",
                f"\t\tDropped Mutations: {120000 if (n + i) % 2 == 0 else 5}",
                "",
            ]
        if ks == "shop":  # secondary-index sub-block (Table (index): form)
            out += [
                "\t\tTable (index): orders.orders_by_user",
                "\t\tSSTable count: 2",
                "\t\tSpace used (live): 500000",
                "\t\tLocal read count: 50",
                "\t\tLocal write count: 75",
                "",
            ]
    return "\n".join(out) + "\n"


def proxyhist_text(ip: str) -> str:
    n = int(ip.split(".")[-1])
    rows = [
        ("50%", 654.95, 785.94),
        ("75%", 943.13, 1131.75),
        ("95%", 1955.67, 2346.80),
        ("98%", 2816.16, 3379.39),
        ("99%", 4055.27, 4866.32),
        ("Min", 51.01 + n, 35.43 + n),
        ("Max", 14530.76, 12108.97),
    ]
    out = [
        "proxy histograms",
        "Percentile       Read Latency      Write Latency      Range Latency",
        "                     (micros)           (micros)           (micros)",
    ]
    for pct, r, w in rows:
        if ip == "10.1.0.2" and pct == "98%":
            continue  # missing-percentile row → engine coalesces to 0.0
        out.append(f"{pct:<12} {r + n:>15.2f} {w + n:>18.2f} {r:>18.2f}")
    return "\n".join(out) + "\n"


SCHEMA = """
CREATE KEYSPACE system WITH replication = {'class': 'LocalStrategy'}  AND durable_writes = true;

CREATE KEYSPACE shop WITH replication = {'class': 'NetworkTopologyStrategy', 'dc1': '3', 'dc2': '2'}  AND durable_writes = true;

CREATE TABLE shop.orders (
    order_id uuid,
    user_id uuid,
    ts timestamp,
    amount decimal,
    status text,
    PRIMARY KEY (order_id, ts)
) WITH CLUSTERING ORDER BY (ts DESC)
    AND bloom_filter_fp_chance = 0.01;

CREATE INDEX orders_by_user ON shop.orders (user_id);

CREATE CUSTOM INDEX orders_status_sai ON shop.orders (status) USING 'StorageAttachedIndex';

CREATE TABLE shop.users (
    user_id uuid PRIMARY KEY,
    name text,
    email text
) WITH bloom_filter_fp_chance = 0.01;

CREATE MATERIALIZED VIEW shop.orders_by_status AS
    SELECT * FROM shop.orders
    WHERE status IS NOT NULL AND order_id IS NOT NULL AND ts IS NOT NULL
    PRIMARY KEY (status, order_id, ts)
    WITH CLUSTERING ORDER BY (order_id ASC);

CREATE TYPE shop.address (
    street text,
    city text,
    zip text
);

CREATE OR REPLACE FUNCTION shop.avg_state (state tuple<int, bigint>, val int)
    CALLED ON NULL INPUT
    RETURNS tuple<int, bigint>
    LANGUAGE java
    AS 'return state;';

CREATE AGGREGATE shop.average (int)
    SFUNC avg_state
    STYPE tuple<int, bigint>
    INITCOND (0, 0);

CREATE KEYSPACE media WITH replication = {'class': 'SimpleStrategy', 'replication_factor': '2'}  AND durable_writes = true;

CREATE TABLE media.assets (
    asset_id uuid PRIMARY KEY,
    kind text,
    bytes blob
) WITH bloom_filter_fp_chance = 0.01;
""".lstrip("\n")


def syslog_text(ip: str) -> str:
    n = int(ip.split(".")[-1])
    dcn = 10 if ip.startswith("10.2") else 0
    out = []
    for i in range(6):
        pause = 210 + 37 * ((n + i + dcn) % 12)
        out.append(
            f"INFO  [Service Thread] 2023-04-0{1 + i % 5} "
            f"0{n}:1{i}:2{i},123 GCInspector.java:284 - ParNew GC in {pause}ms.  "
            f"CMS Old Gen: 378183216 -> 378196712;"
        )
    out.append(
        f"WARN  [ReadStage-2] 2023-04-03 0{n}:30:00,500 ReadCommand.java:569 - "
        f"Read {40 + n} live rows and {1200 + 100 * n} tombstone cells for query "
        f"SELECT * FROM shop.orders WHERE user_id = 42 LIMIT 5000 "
        f"(see tombstone_warn_threshold)"
    )
    out.append(
        f"WARN  [ReadStage-1] 2023-04-04 0{n}:31:00,500 ReadCommand.java:569 - "
        f"Read {10 + n} live and 800 tombstone cells for query "
        f"SELECT * FROM shop.users WHERE name = 'x' LIMIT 100 "
        f"(see tombstone_warn_threshold)"
    )
    return "\n".join(out) + "\n"


def main() -> None:
    for d, ip in zip(DIRS, IPS):
        base = os.path.join(ROOT, d)
        nt = os.path.join(base, "nodetool")
        logs = os.path.join(base, "logs", "cassandra")
        drv = os.path.join(base, "driver")
        for p in (nt, logs, drv):
            os.makedirs(p, exist_ok=True)

        def w(rel: str, text: str, base=base) -> None:
            with open(os.path.join(base, rel), "w") as f:
                f.write(text)

        w("nodetool/status", status_text())
        w("nodetool/gossipinfo", gossip_text())
        w("nodetool/info", info_text(ip))
        w("nodetool/describecluster", "Cluster Information:\n\tName: FixtureCluster\n\tSnitch: SimpleSnitch\n")
        w("nodetool/version", "ReleaseVersion: 4.0.7\n")
        # tablestats fallback on one node; legacy labels on another
        if d == "10_1_0_2":
            w("nodetool/tablestats", cfstats_text(ip))
        elif d == "10-2-0-1":
            w("nodetool/cfstats", cfstats_text(ip, legacy=True))
        else:
            w("nodetool/cfstats", cfstats_text(ip))
        if ip != "10.2.0.1":  # one node has no proxyhistograms file
            w("nodetool/proxyhistograms", proxyhist_text(ip))
        w("driver/schema", SCHEMA)
        if d == "nodeh4":  # zip-compressed log on the hostname-only node
            zpath = os.path.join(logs, "system.log.zip")
            with zipfile.ZipFile(zpath, "w") as zf:
                zf.writestr("system.log", syslog_text(ip))
        else:
            w("logs/cassandra/system.log", syslog_text(ip))
            if d == "10.1.0.1":  # rotated second log file
                w("logs/cassandra/system.log.1", syslog_text(ip).replace("2023-04", "2023-03"))

    # optional AdditionalLogs side tree (explore.py:1048-1066)
    extra = os.path.join(os.path.dirname(ROOT), "AdditionalLogs",
                         "10-2-0-1", "var", "log", "cassandra")
    os.makedirs(extra, exist_ok=True)
    with open(os.path.join(extra, "system.log"), "w") as f:
        f.write(syslog_text("10.2.0.1").replace("2023-04", "2023-02"))
    print(f"fixture written under {ROOT}")


if __name__ == "__main__":
    main()
