"""Engine configuration: thresholds, guardrails, system-keyspace list.

Mirrors the reference's CLI-tunable health-check parameters
(/root/reference/explore.py:23-44) and the system-keyspace exclusion
list (/root/reference/explore.py:469).  All values are plain data so
queries stay declarative and Catalyst can constant-fold them.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Thresholds:
    """Health-test parameters (tp_*) and Astra guardrails (gr_*).

    Reference: explore.py:23-44.  The reference clamps CLI overrides to
    the guardrail values (explore.py:150-169); ``clamped`` reproduces
    that rule as a total function (bug B4 in SURVEY.md §8 is fixed:
    explicit default, no silent None).
    """

    tp_mv: int = 2            # materialized views per table
    tp_si: int = 1            # secondary indexes per table
    tp_sai: int = 8           # storage-attached indexes per table (B8: int, not float)
    tp_tblcnt: int = 155      # tables in a cluster
    tp_colcnt: int = 45       # columns in a table
    tp_lpar_mb: int = 100     # partition size (MB)
    tp_rl_ms: int = 100       # local read latency (ms)
    tp_wl_ms: int = 100       # local write latency (ms)
    tp_sstbl: int = 20        # sstable count per node/table
    tp_gcp_ms: int = 800      # P99 GC pause (ms)
    tp_drm: int = 100_000     # dropped mutations per table
    tp_ts: int = 1_000        # tombstones per read

    gr_mv: int = 2
    gr_si: int = 1
    gr_sai: int = 50
    gr_tblcnt: int = 200
    gr_colcnt: int = 75
    gr_lpar_mb: int = 200

    def clamped(self, **overrides: int) -> "Thresholds":
        """Apply user overrides, clamping each tp_* to its guardrail.

        Reference explore.py:150-169 accepts a CLI tp override only when
        it does not exceed the matching gr_* guardrail; larger values
        fall back to the guardrail (bug B4's silent-None path is fixed:
        unknown keys raise, values are always ints).
        """
        caps = {
            "tp_mv": self.gr_mv, "tp_si": self.gr_si, "tp_sai": self.gr_sai,
            "tp_tblcnt": self.gr_tblcnt, "tp_colcnt": self.gr_colcnt,
            "tp_lpar_mb": self.gr_lpar_mb,
        }
        cleaned: dict[str, int] = {}
        for key, val in overrides.items():
            if not hasattr(self, key):
                raise KeyError(f"unknown threshold {key!r}")
            val = int(val)  # B8: tp_sai was float in the reference
            if key in caps:
                val = min(val, caps[key])
            cleaned[key] = val
        from dataclasses import replace
        return replace(self, **cleaned)


# Reference explore.py:469 — keyspaces excluded from workload/size views
# unless the user passes -incl_sys (P3 in SURVEY.md §2.2).
SYSTEM_KEYSPACES: tuple[str, ...] = (
    "OpsCenter", "dse_insights_local", "solr_admin", "test", "dse_system",
    "dse_analytics", "system_auth", "system_traces", "system",
    "dse_system_local", "system_distributed", "system_schema", "dse_perf",
    "dse_insights", "dse_security", "killrvideo", "dse_leases", "dsefs_c4z",
    "HiveMetaStore", "dsefs", "spark_system",
)

# Seconds in an average month (365.25/12 days) — explore.py:1814,1820.
SECONDS_PER_MONTH: int = 2_629_800

# GC pauses below this are not present in system.log (explore.py:452).
GC_LOG_FLOOR_MS: int = 200


@dataclass(frozen=True)
class EngineConfig:
    thresholds: Thresholds = field(default_factory=Thresholds)
    include_system_keyspaces: bool = False  # reference -incl_sys flag

    @property
    def excluded_keyspaces(self) -> tuple[str, ...]:
        if self.include_system_keyspaces:
            # Reference keeps OpsCenter excluded even with -incl_sys
            # (explore.py:473-476).
            return ("OpsCenter",)
        return SYSTEM_KEYSPACES


DEFAULT_CONFIG = EngineConfig()
