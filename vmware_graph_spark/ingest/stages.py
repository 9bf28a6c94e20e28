"""Per-sheet ingest stages: RVTools workbook → property-graph store.

One function per ingest statement of the reference's pass 1
(refresh-vmware.cypher:33-277), re-expressed as declarative DataFrame
transforms feeding ``GraphStore`` upserts. Each stage docstring cites
the statement it reproduces. Known reference bugs are NOT replicated —
see SURVEY §0.2 (bug ledger) — and two documented divergences:

- Vresourcepool identity is (vc, path) everywhere, where the reference
  mixes (name,cluster,dc,vc) [cypher:66] and (path,vc) [cypher:199];
  under the reference's keying, equally-named pools at different depths
  of the same cluster collapse into one node — ours stay distinct.
- parent paths are computed structurally (functions.scalar.path_parent)
  instead of ``replace(path,'/'+name,'')`` [cypher:64,216-217], which
  corrupts paths whose leaf repeats an interior segment.

Cypher MATCH = inner join (rows without a match are silently dropped);
OPTIONAL MATCH = left join; MERGE on a null key fails the row (we drop
it). All three semantics live in operators.merge / plain joins here.

Scale notes: every MATCH against a dimension label is a broadcast join
(dim tables are ≪ MB). The only large-large joins are rows⋈VM and
rows⋈host tables, which hash-partition on the natural key — same key
every stage, so AQE reuses the exchange where plans allow.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vmware_graph_spark.functions.scalar import (
    IPV4_RE,
    path_last,
    path_parent,
    rlike_full,
    split_literal,
    try_int,
)
from vmware_graph_spark.store.graph import GraphStore, node_key

UID = "VI SDK UUID"
SERVER = "VI SDK Server"


def _edges(
    df: DataFrame,
    src_label: str,
    src_key,
    rel_type: str,
    dst_label: str,
    dst_key,
    props: Mapping[str, F.Column] | None = None,
) -> DataFrame:
    cols = [
        F.lit(src_label).alias("src_label"),
        src_key.alias("src_key"),
        F.lit(rel_type).alias("rel_type"),
        F.lit(dst_label).alias("dst_label"),
        dst_key.alias("dst_key"),
    ]
    for name, expr in (props or {}).items():
        cols.append(expr.alias(name))
    return df.select(*cols)


def _dim(store: GraphStore, df: DataFrame, label: str, name_expr, extra=None) -> None:
    """MERGE a single-key dimension label from an expression column."""
    cols = [name_expr.alias("name")]
    for k, e in (extra or {}).items():
        cols.append(e.alias(k))
    store.upsert_nodes(label, df.select(*cols).filter(F.col("name").isNotNull()).distinct())


def _bt(name: str) -> str:
    """Backtick-quote an identifier for SQL-string expression building
    (RVTools column names carry spaces and '#')."""
    return "`" + name.replace("`", "``") + "`"


class _Raw(str):
    """Explicit marker for a pre-built SQL expression passed to
    :func:`_key_sql`. Anything NOT wrapped is treated as a column NAME
    and backticked — a sheet column whose name happens to start with
    '(' can therefore never be injected as raw SQL (round-7 ADVICE)."""


def _key_sql(*cols: str) -> str:
    """SQL-string twin of :func:`node_key` for the selectExpr-built fan
    batches: NULL if any component is null (concat semantics), chr(31)
    separator. ``cols`` are column NAMES (backticked here) or
    :class:`_Raw`-wrapped SQL expressions (passed through verbatim)."""
    qs = [c if isinstance(c, _Raw) else _bt(c) for c in cols]
    if len(qs) == 1:
        return f"cast({qs[0]} AS string)"
    return "concat(" + ", chr(31), ".join(f"cast({q} AS string)" for q in qs) + ")"


def _dims_tagged(store: GraphStore, df: DataFrame, specs) -> None:
    """Fuse k single-key STRING dimension MERGEs from one sheet into ONE
    tagged explode + ONE distinct: the label rides as a data column
    through a single plan subtree (the node-upsert half of the
    edge-fusion pattern, round-6 VERDICT #6), split back per label only
    at the store boundary — k explode/distinct subtrees and k flush
    shuffles become 1, and the whole fan is TWO selectExpr strings
    instead of k column chains. ``specs`` = [(label, name_sql), ...]
    with ``name_sql`` a SQL expression string; labels with extra
    properties or non-string keys keep their own ``_dim``."""
    fan = ", ".join(
        f"struct('{label}' AS l, {name_sql} AS name)" for label, name_sql in specs
    )
    tagged = (
        df.selectExpr(f"explode(array({fan})) AS __d")
        .selectExpr("__d.l AS __l", "__d.name AS name")
        .filter("name IS NOT NULL")
        .distinct()
    )
    # one shared cut: each label's flush re-reads the SAME materialized
    # distinct instead of re-running the explode per label
    tagged = store._cut(tagged)
    for label in dict.fromkeys(label for label, _ in specs):
        store.upsert_nodes(
            label, tagged.filter(f"__l = '{label}'").selectExpr("name")
        )


# --------------------------------------------------------------------------
# Stage: vCluster → Vcenterserver / Vcentercluster (+sentinels)
# --------------------------------------------------------------------------


def stage_vcluster(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:34-41.

    Creates the vCenter node (uid key), the per-tenant cluster nodes
    with status/capacity props, two sentinel nodes ('None Configured'
    resource pool, 'None Provided' portgroup) and the undirected
    cluster—vCenter edge. The reference's bug at :37 (REMOVEs
    vrp.unverified instead of vpg) is moot here: snapshot semantics
    re-assert both sentinels every run.
    """
    row = sheets["vCluster"]
    store.upsert_nodes(
        "Vcenterserver",
        row.selectExpr(f"{_bt(UID)} AS uid", f"{_bt(SERVER)} AS name").distinct(),
    )
    store.upsert_nodes(
        "Vresourcepool",
        row.selectExpr(
            f"{_bt(SERVER)} AS vc",
            "'None Configured' AS path",
            "'None Configured' AS name",
        ).distinct(),
    )
    store.upsert_nodes(
        "Vmportgroup",
        row.selectExpr(
            "'None Provided' AS name", f"{_bt(UID)} AS managedby"
        ).distinct(),
    )
    store.upsert_nodes(
        "Vcentercluster",
        row.selectExpr(
            "Name AS name",
            f"{_bt(UID)} AS managedby",
            # bug §0.2.6 kept as declared behavior: status → `hosts`
            "OverallStatus AS hosts",
            "TotalCpu AS cpu",
            "NumCpuCores AS CpuCored",
            "TotalMemory AS memory",
            "`HA enabled` AS ha",
            "`DRS enabled` AS drs",
        ),
    )
    store.add_edges(
        row.selectExpr(
            "'Vcentercluster' AS src_label",
            f"{_key_sql('Name', UID)} AS src_key",
            "'CONTROLLED_BY_VC' AS rel_type",
            "'Vcenterserver' AS dst_label",
            f"{_key_sql(UID)} AS dst_key",
        )
    )


# --------------------------------------------------------------------------
# Stage: vInfo (first block) → vCenter version/build dims
# --------------------------------------------------------------------------


def stage_vcenter_version(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:44-51: DISTINCT server type → split
    ' build-' → version + build dims + BUILD_OF / IS_VCENTER_BUILD."""
    row = sheets["vInfo"]
    vc = store.vertices("Vcenterserver")
    parts = (
        row.select(
            F.col("VI SDK Server type").alias("vcversion"),
            F.col(SERVER).alias("vcserver"),
        )
        .distinct()
        .select(
            "vcserver",
            split_literal("vcversion", " build-").getItem(0).alias("vname"),
            split_literal("vcversion", " build-").getItem(1).alias("build"),
        )
        # MATCH (vc {name:vcserver}) — inner join drops unknown servers
        .join(vc.select(F.col("name").alias("vcserver"), "uid"), "vcserver")
        # null build would fail the Cypher MERGE → row dropped
        .filter(F.col("vname").isNotNull() & F.col("build").isNotNull())
    )
    _dim(store, parts, "Vcenterversion", F.col("vname"))
    store.upsert_nodes("Vcenterbuild", parts.select(F.col("build")).distinct())
    store.add_edges(
        _edges(parts, "Vcenterbuild", node_key("build"), "BUILD_OF", "Vcenterversion", node_key("vname"))
    )
    store.add_edges(
        _edges(parts, "Vcenterserver", node_key("uid"), "IS_VCENTER_BUILD", "Vcenterbuild", node_key("build"))
    )


# --------------------------------------------------------------------------
# Stage: vRP → Vspheredatacenter + Vresourcepool tree
# --------------------------------------------------------------------------


def stage_vrp(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:55-71: the path→hierarchy pattern.

    ``/DC/Cluster/Resources/a/b`` splits on 'Resources' into the
    datacenter/cluster head and the pool tail; pools become nodes keyed
    (vc, full path) with parent edges via a self-join on the parent
    path (§2.10 pattern 1).
    """
    row = sheets["vRP"]
    rp = split_literal(F.col("Resource pool"), "Resources")
    parsed = row.select(
        "*",
        F.element_at(split_literal(rp.getItem(0), "/"), 2).alias("datacenter"),
        F.element_at(split_literal(rp.getItem(0), "/"), 3).alias("cluster"),
        rp.getItem(1).alias("resourcepool"),
    )
    vc = store.vertices("Vcenterserver").select(F.col("name").alias("__vcname"), F.col("uid").alias("__vcuid"))
    vcc = store.vertices("Vcentercluster").select(
        F.col("name").alias("__ccname"), F.col("managedby").alias("__ccuid")
    )
    # MATCH vc by name AND vcc by (cluster, uid) — inner joins (:59)
    joined = (
        parsed.join(vc, parsed[SERVER] == vc.__vcname)
        .join(vcc, (F.col("cluster") == vcc.__ccname) & (F.col(UID) == vcc.__ccuid), "inner")
        .drop("__ccname")
    )
    store.upsert_nodes(
        "Vspheredatacenter",
        joined.select(F.col("datacenter").alias("name"), F.col(UID).alias("managedby")).distinct(),
    )
    store.add_edges(
        _edges(joined, "Vcentercluster", node_key("cluster", F.col(UID)), "LOCATED_IN_DC",
               "Vspheredatacenter", node_key("datacenter", F.col(UID)))
    )
    store.add_edges(
        _edges(joined, "Vspheredatacenter", node_key("datacenter", F.col(UID)),
               "CONTROLLED_BY_VC", "Vcenterserver", node_key(F.col(UID)))
    )
    pools = joined.select(
        "*",
        path_last("resourcepool").alias("pool"),
        path_parent("resourcepool").alias("parentpath"),
    ).filter(F.col("pool") != "")
    store.upsert_nodes(
        "Vresourcepool",
        pools.select(
            F.col(SERVER).alias("vc"),
            F.col("Resource pool").alias("path"),
            F.col("pool").alias("name"),
            F.col("cluster"),
            F.col("datacenter").alias("dc"),
            F.col("# VMs").alias("vms"),
            F.col("# vCPUs").alias("cpus"),
            F.col("Mem Configured").alias("memcfg"),
        ),
    )
    store.add_edges(
        _edges(pools, "Vresourcepool", node_key(F.col(SERVER), F.col("Resource pool")),
               "MEMBER_OF_CLUSTER", "Vcentercluster", node_key("cluster", F.col(UID)))
    )
    # parent pool self-join (:70-71): parent node exists iff another row
    # of this sheet claims the parent's full path (within the same vc).
    parent_full = F.concat(
        F.element_at(split_literal(F.col("Resource pool"), "Resources"), 1),
        F.lit("Resources"),
        F.col("parentpath"),
    )
    with_parent = pools.select(
        F.col(SERVER).alias("vc"), F.col("Resource pool").alias("path"),
        F.when(F.col("parentpath") != "", parent_full).alias("parent_path"),
    )
    parents = pools.select(
        F.col(SERVER).alias("vc"), F.col("Resource pool").alias("parent_path")
    ).distinct()
    linked = with_parent.join(parents, ["vc", "parent_path"], "inner")
    store.add_edges(
        _edges(linked, "Vresourcepool", node_key("vc", "path"), "CHILD_RESOURCE_POOL",
               "Vresourcepool", node_key("vc", "parent_path"))
    )


# --------------------------------------------------------------------------
# Stage: vHost → Vspherehost + 12 dimension links + domain tail
# --------------------------------------------------------------------------


def stage_vhost(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:73-103."""
    row = sheets["vHost"]
    vc = store.vertices("Vcenterserver").select(F.col("name").alias("__vcname"), F.col("uid").alias("__vcuid"))
    vcc = store.vertices("Vcentercluster").select(
        F.col("name").alias("__ccname"), F.col("managedby").alias("__ccuid")
    )
    joined = (
        row.join(vc, row[SERVER] == vc.__vcname)
        .join(vcc, (row["Cluster"] == vcc.__ccname) & (row[UID] == vcc.__ccuid))
    )
    host_key = node_key(F.col("Object ID"), F.col(UID))
    store.upsert_nodes(
        "Vspherehost",
        joined.selectExpr(
            "`Object ID` AS objid",
            f"{_bt(UID)} AS managedby",
            "Host AS name",
            "NumHosts AS hosts",
            "`# CPU` AS cpu",
            "`# Cores` AS cores",
            "`# Memory` AS memory",
            "`Memory usage %` AS memusage",
            "`# VMs` AS vms",
            "`Assigned License(s)` AS license",
            "`Max EVC` AS chipset",
            "`Boot time` AS boot",
            "`Service tag` AS servicetag",
        ),
    )
    host_key_sql = _key_sql("Object ID", UID)
    store.add_edges(_edges(joined, "Vspherehost", host_key, "CONTROLLED_BY_VC",
                           "Vcenterserver", node_key(F.col(UID))))
    store.add_edges(_edges(joined, "Vspherehost", host_key, "MEMBER_OF_CLUSTER",
                           "Vcentercluster", node_key("Cluster", F.col(UID))))

    # SQL-string twins of the dim expressions (the split delimiter has
    # no regex metacharacters, so SQL split == split_literal here)
    esx_ver_sql = _Raw("(split(`ESX Version`, ' build-')[0])")
    esx_build_sql = _Raw("(split(`ESX Version`, ' build-')[1])")
    vendor_sql = _Raw("(coalesce(Vendor, 'None Provided'))")
    model_sql = _Raw("(coalesce(Model, 'None Provided'))")
    bios_ver_sql = _Raw("(coalesce(`BIOS Version`, 'None Provided'))")

    # six plain string dims fuse through ONE tagged explode + distinct
    # (the stage_vinfo_vms _dims_tagged pattern); Vsphereesxbuild
    # (build key) and Biosversion (two-column key) keep their own
    # upserts below
    _dims_tagged(
        store,
        joined,
        [
            ("Vconfigstatus", _bt("Config status")),
            ("Vspherecpupwrmgpol", _bt("Current CPU power man. policy")),
            ("Vspherehostpwrmgpol", _bt("Host Power Policy")),
            ("Cpumodel", _bt("CPU Model")),
            ("Vsphereesxversion", esx_ver_sql),
            ("Crmmanufacturer", vendor_sql),
            ("Crmmodel", model_sql),
        ],
    )
    store.upsert_nodes(
        "Vsphereesxbuild",
        joined.selectExpr(f"{esx_build_sql} AS build").filter("build IS NOT NULL").distinct(),
    )
    store.upsert_nodes(
        "Biosversion",
        joined.selectExpr(f"{bios_ver_sql} AS version", "`BIOS Date` AS date")
        .filter("date IS NOT NULL")
        .distinct(),
    )

    # one edge batch for the nine host→dim rels: rel_type/dst_label
    # ride as data columns through a single explode instead of nine
    # sheet-scanning selects (same fusion as stage_vinfo_vms; null dim
    # values yield null dst_key, dropped by merge like before) — the
    # whole fan is one selectExpr string
    host_fan = ", ".join(
        f"struct('{rel}' AS r, '{label}' AS l, {k} AS k)"
        for rel, label, k in [
            ("CONFIG_STATUS", "Vconfigstatus", _key_sql("Config status")),
            ("IN_CPU_POW_MGMT", "Vspherecpupwrmgpol",
             _key_sql("Current CPU power man. policy")),
            ("IN_HOST_POW_PLCY", "Vspherehostpwrmgpol", _key_sql("Host Power Policy")),
            ("HAS_CPU", "Cpumodel", _key_sql("CPU Model")),
            ("IS_ESX_BUILD", "Vsphereesxbuild", _key_sql(esx_build_sql)),
            ("IS_ESX_VERSION", "Vsphereesxversion", _key_sql(esx_ver_sql)),
            ("MANUFACTURED_BY", "Crmmanufacturer", _key_sql(vendor_sql)),
            ("ASSET_MODEL", "Crmmodel", _key_sql(model_sql)),
            ("BIOS_VERSION", "Biosversion", _key_sql(bios_ver_sql, "BIOS Date")),
        ]
    )
    store.add_edges(
        joined.selectExpr(
            "'Vspherehost' AS src_label",
            f"{host_key_sql} AS src_key",
            f"explode(array({host_fan})) AS __p",
        ).selectExpr(
            "src_label", "src_key",
            "__p.r AS rel_type", "__p.l AS dst_label", "__p.k AS dst_key",
        )
    )
    store.add_edges(
        joined.selectExpr(
            "'Vsphereesxbuild' AS src_label",
            f"{_key_sql(esx_build_sql)} AS src_key",
            "'BUILD_OF' AS rel_type",
            "'Vsphereesxversion' AS dst_label",
            f"{_key_sql(esx_ver_sql)} AS dst_key",
        )
    )
    store.add_edges(
        joined.selectExpr(
            "'Biosversion' AS src_label",
            f"{_key_sql(bios_ver_sql, 'BIOS Date')} AS src_key",
            "'MANUFACTURED_BY' AS rel_type",
            "'Crmmanufacturer' AS dst_label",
            f"{_key_sql(vendor_sql)} AS dst_key",
        )
    )

    # domain tail (:100-103): 2-hop MATCH through the seeded
    # Clientdomain—Company edge; inner semantics drop unseeded domains.
    cd = store.vertices("Clientdomain")
    comp_edges = (
        store.edges()
        .filter(
            (F.col("rel_type") == "OF_COMPANY")
            | ((F.col("src_label") == "Clientdomain") & (F.col("dst_label") == "Company"))
            | ((F.col("src_label") == "Company") & (F.col("dst_label") == "Clientdomain"))
        )
    )
    if cd is not None:
        dom = F.coalesce(F.col("Domain"), F.lit("None Provided"))
        sym = comp_edges.select(
            F.when(F.col("src_label") == "Clientdomain", F.col("src_key")).otherwise(F.col("dst_key")).alias("__cdkey"),
            F.when(F.col("src_label") == "Clientdomain", F.col("dst_key")).otherwise(F.col("src_key")).alias("__cokey"),
        ).distinct()
        tail = (
            joined.select("*", dom.alias("__dom"))
            .join(cd.select(F.col("name").alias("__dom")), "__dom")
            .join(sym, node_key("__dom") == sym.__cdkey)
        )
        store.add_edges(_edges(tail, "Vspherehost", host_key, "OF_DOMAIN",
                               "Clientdomain", node_key("__dom")))
        store.add_edges(_edges(tail, "Vspherehost", host_key, "ESX_HOST_FOR",
                               "Company", F.col("__cokey")))


# --------------------------------------------------------------------------
# Stage: NTP / DNS classification (the IP-vs-FQDN branch)
# --------------------------------------------------------------------------


def _server_list_stage(
    store: GraphStore,
    sheets: Mapping[str, DataFrame],
    *,
    col: str,
    label: str,
    rel: str,
) -> None:
    """refresh-vmware.cypher:106-139: explode a comma-joined server
    list, trim, classify each entry with the ANCHORED IPv4 regex
    (Cypher `=~` full-match — the P5 trap), and upsert ip-keyed vs
    fqdn-keyed dimension nodes + USES_* edges."""
    row = sheets["vHost"]
    hosts = store.vertices("Vspherehost").select(
        F.col("objid").alias("__objid"), F.col("name").alias("__hname"), F.col("managedby").alias("__huid")
    )
    # MATCH {objid, name} (:107) — objid + name equality, any tenant
    j = row.join(
        hosts,
        (row["Object ID"] == hosts.__objid) & (row["Host"] == hosts.__hname),
    )
    entries = (
        j.filter(F.col(col).isNotNull())
        .select("__objid", "__huid", F.explode(split_literal(F.col(col), ",")).alias("raw"))
        .select("__objid", "__huid", F.trim("raw").alias("address"))
    )
    is_ip = rlike_full(F.col("address"), IPV4_RE)
    classified = entries.select(
        "__objid", "__huid",
        F.when(is_ip, F.lit("ip")).otherwise(F.lit("fqdn")).alias("kind"),
        "address",
    )
    store.upsert_nodes(
        label,
        classified.select(
            "kind", "address",
            F.when(F.col("kind") == "ip", F.col("address")).alias("ipaddress"),
            F.when(F.col("kind") == "fqdn", F.col("address")).alias("fqdn"),
        ).distinct(),
    )
    store.add_edges(
        _edges(classified, "Vspherehost", node_key("__objid", "__huid"), rel,
               label, node_key("kind", "address"))
    )


def stage_ntp(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    _server_list_stage(store, sheets, col="NTP Server(s)", label="Ntpserver", rel="USES_NTP")


def stage_dns(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    _server_list_stage(store, sheets, col="DNS Servers", label="Dnsserver", rel="USES_DNS")


# --------------------------------------------------------------------------
# Host-network stages: vSwitch / vPort / vNIC (share the edge-hop join)
# --------------------------------------------------------------------------


def _rows_host_cluster(store: GraphStore, row: DataFrame) -> DataFrame:
    """The J3 edge-hop MATCH (vmh {name:Host})--(vcc {name:Cluster,
    managedby:uid}) [cypher:143,156,168]: host by NAME joined to the
    cluster through any existing edge, either direction."""
    hosts = store.vertices("Vspherehost").select(
        F.col("name").alias("__hname"), node_key("objid", "managedby").alias("__hkey")
    )
    clusters = store.vertices("Vcentercluster").select(
        F.col("name").alias("__cname"), F.col("managedby").alias("__cuid"),
        node_key("name", "managedby").alias("__ckey"),
    )
    e = store.edges().select("src_label", "src_key", "dst_label", "dst_key")
    sym = e.unionByName(
        e.select(
            F.col("dst_label").alias("src_label"), F.col("dst_key").alias("src_key"),
            F.col("src_label").alias("dst_label"), F.col("src_key").alias("dst_key"),
        )
    )
    hop = (
        sym.filter((F.col("src_label") == "Vspherehost") & (F.col("dst_label") == "Vcentercluster"))
        .select(F.col("src_key").alias("__hkey"), F.col("dst_key").alias("__ckey"))
        .distinct()
    )
    linked = hosts.join(hop, "__hkey").join(clusters, "__ckey")
    return (
        row.join(
            linked,
            (row["Host"] == linked.__hname)
            & (row["Cluster"] == linked.__cname)
            & (row[UID] == linked.__cuid),
        )
    )


def stage_vswitch(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:142-152 (+ the J6 Jumboframes theta join)."""
    j = _rows_host_cluster(store, sheets["vSwitch"])
    sw_key = node_key(F.col("Switch"), F.col("Host"))
    store.upsert_nodes(
        "Vswitch",
        j.select(
            F.col("Switch").alias("name"),
            F.col("Host").alias("host"),
            F.col("# Ports").alias("ports"),
            F.col("Free Ports").alias("freeports"),
            F.col("Promiscuous Mode").alias("promiscuous"),
            F.col("Mac Changes").alias("macchanges"),
            F.col("Forged Transmits").alias("forged"),
            F.col("Traffic Shaping").alias("shaping"),
            F.col("Notify Switch").alias("notifysw"),
            try_int(F.col("MTU")).alias("mtu"),
            F.col("Offload").alias("offload"),
        ),
    )
    store.add_edges(_edges(j, "Vswitch", sw_key, "VSWITCH_FOR_HOST", "Vspherehost", F.col("__hkey")))
    # Vlbpolicy here has NO coalesce (:148) — null Policy fails the row
    pol = j.filter(F.col("Policy").isNotNull())
    _dim(store, pol, "Vlbpolicy", F.col("Policy"))
    store.add_edges(_edges(pol, "Vswitch", sw_key, "LOAD_BALANCING_POLICY", "Vlbpolicy", node_key(F.col("Policy"))))
    # Jumboframes (:151-152): cartesian with the 1-row seed, theta mtu>=9000
    jumbo = store.vertices("Jumboframes")
    if jumbo is not None:
        big = j.filter(try_int(F.col("MTU")) >= 9000).crossJoin(
            F.broadcast(jumbo.filter(F.col("name") == "enabled").select(F.col("name").alias("__jmb")))
        )
        store.add_edges(_edges(big, "Vswitch", sw_key, "HAS_JUMBO_FRAMES", "Jumboframes", node_key("__jmb")))


def stage_vport(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:155-163."""
    j = _rows_host_cluster(store, sheets["vPort"])
    vsw = store.vertices("Vswitch").select(
        F.col("name").alias("__swname"), F.col("host").alias("__swhost"),
        node_key("name", "host").alias("__swkey"),
    )
    j = j.join(vsw, (j["Switch"] == vsw.__swname) & (j["Host"] == vsw.__swhost))
    pg_key = node_key(F.col("Port Group"), F.col("Host"), F.col(UID))
    store.upsert_nodes(
        "Vportgroup",
        j.select(F.col("Port Group").alias("name"), F.col(UID).alias("managedby")).distinct(),
    )
    store.upsert_nodes(
        "Vhostportgroup",
        j.select(
            F.col("Port Group").alias("name"),
            F.col("Host").alias("host"),
            F.col(UID).alias("managedby"),
            F.col("VLAN").alias("vlan"),
            F.col("Promiscuous Mode").alias("promiscuous"),
            F.col("Mac Changes").alias("macchanges"),
            F.col("Forged Transmits").alias("forged"),
            F.col("Traffic Shaping").alias("shaping"),
        ),
    )
    _dim(store, j, "Vlbpolicy", F.coalesce(F.col("Policy"), F.lit("None Provided")))
    store.add_edges(_edges(j, "Vhostportgroup", pg_key, "HOST_PG_FOR",
                           "Vportgroup", node_key(F.col("Port Group"), F.col(UID))))
    store.add_edges(_edges(j, "Vhostportgroup", pg_key, "STANDARD_PG_ON", "Vspherehost", F.col("__hkey")))
    store.add_edges(_edges(j, "Vswitch", F.col("__swkey"), "LOAD_BALANCING_POLICY",
                           "Vlbpolicy", node_key(F.coalesce(F.col("Policy"), F.lit("None Provided")))))


def stage_vnic(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:166-176."""
    j = _rows_host_cluster(store, sheets["vNIC"])
    vsw = store.vertices("Vswitch").select(
        F.col("name").alias("__swname"), F.col("host").alias("__swhost"),
        node_key("name", "host").alias("__swkey"),
    )
    j = j.join(vsw, (j["Switch"] == vsw.__swname) & (j["Host"] == vsw.__swhost))
    speed = F.coalesce(F.col("Speed"), F.lit("No link"))
    driver = F.coalesce(F.col("Driver"), F.lit("None Provided"))
    nic_key = node_key(F.col("Network Device"), F.col("Host"))
    store.upsert_nodes(
        "Vmnic",
        j.select(
            F.col("Network Device").alias("name"),
            F.col("Host").alias("host"),
            F.col("MAC").alias("mac"),
            F.col("WakeOn").alias("wake"),
            F.col("PCI").alias("pci"),
        ),
    )
    _dim(store, j, "Vmnicdriver", driver)
    _dim(store, j, "Vmnicspeed", speed)
    store.add_edges(_edges(j, "Vmnic", nic_key, "USES_DRIVER", "Vmnicdriver", node_key(driver)))
    store.add_edges(_edges(j, "Vmnic", nic_key, "LINK_SPEED", "Vmnicspeed", node_key(speed)))
    store.add_edges(_edges(j, "Vmnic", nic_key, "PNIC_OF_HOST", "Vspherehost", F.col("__hkey")))
    store.add_edges(_edges(j, "Vswitch", F.col("__swkey"), "NETWORK_ADAPTERS", "Vmnic", nic_key))


# --------------------------------------------------------------------------
# Stage: vInfo → Virtualmachine (the hardest sheet: conditionals,
# fan-out, folder & pool hierarchies)
# --------------------------------------------------------------------------


def stage_vinfo_vms(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:179-224.

    Covers M6 (FOREACH-CASE conditional MERGEs), the Network #1-4
    fan-out (§2.10-6), the folder/pool hierarchy self-joins
    (§2.10-1/2), and the HW_VERSION edge property. Reference bug
    §0.2.3 (fqdn read from the node instead of the row) is fixed:
    fqdn := row.`DNS Name`.
    """
    row = sheets["vInfo"]
    vm_key = node_key(F.col("VM UUID"), F.col(UID))
    folder_head = F.element_at(split_literal(F.col("Folder"), "/"), 2)
    rp_cluster = F.element_at(split_literal(F.col("Resource pool"), "/"), 3)

    store.upsert_nodes(
        "Virtualmachine",
        row.selectExpr(
            "`VM UUID` AS uuid",
            f"{_bt(UID)} AS managedby",
            "VM AS name",
            "`DNS Name` AS fqdn",
            "PowerOn AS poweron",
            "`Change Version` AS changedon",
            "Annotation AS note",
            "`VM ID` AS vmid",
            "`Consolidation Needed` AS needsconsolidation",
            "CPUs AS cpus",
            "try_cast(Memory AS int) AS memory",
            "try_cast(NICs AS int) AS nics",
            "try_cast(Disks AS int) AS disks",
            "CBT AS cbt",
        ),
    )

    # Vcpus dim: name = CPUs + ' vCPUs' (Cypher int+string concat), qty prop
    vcpu_name = F.concat(F.col("CPUs").cast("string"), F.lit(" vCPUs"))
    _dim(store, row, "Vcpus", vcpu_name, extra={"qty": try_int(F.col("CPUs"))})
    hw_name = try_int(F.col("HW version"))
    store.upsert_nodes(
        "Vhwver", row.select(hw_name.alias("name")).filter(hw_name.isNotNull()).distinct()
    )
    # HW_VERSION carries the one edge property in the whole reference
    # (cypher:187,212 SET r.upgradestatus) — first-class via the store's
    # props map; readable off a written snapshot (edges_with_props).
    store.add_edges(
        _edges(
            row, "Virtualmachine", vm_key, "HW_VERSION", "Vhwver", node_key(hw_name),
            props={"upgradestatus": F.col("HW upgrade status")},
        )
    )

    # FOREACH-CASE conditionals (M6, :199-203) → filtered sub-upserts
    rp_cond = F.col("Resource pool").isNotNull() & (F.size(split_literal(F.col("Resource pool"), "/")) > 4)
    rp_rows = row.filter(rp_cond)
    store.upsert_nodes(
        "Vresourcepool",
        rp_rows.select(
            F.col(SERVER).alias("vc"),
            F.col("Resource pool").alias("path"),
            path_last("Resource pool").alias("name"),
        ),
    )
    fl_cond = F.col("Folder").isNotNull() & (F.size(split_literal(F.col("Folder"), "/")) > 2)
    fl_rows = row.filter(fl_cond)
    store.upsert_nodes(
        "Vfolder",
        fl_rows.select(F.col("Folder").alias("path"), path_last("Folder").alias("name")),
    )

    # ONE tagged explode for the ten per-VM edge families (five state
    # dims, HAS_VCPUS, two OS rels, the two M6 conditional rels):
    # rel_type/dst_label ride as data columns; a null dst_key — null
    # dim value, or a FOREACH-CASE condition that's false — drops the
    # row in merge exactly like the former per-rel filters did. One
    # plan subtree + one edge batch where there were ten (round-6: 11
    # subtrees fused to 3; round-7 finishes the job — py4j plan
    # chatter and the edges() union width both shrink ~3×). The
    # matching node upserts for the plain string dims fuse the same
    # way (_dims_tagged); Vcpus keeps its own _dim (extra qty prop)
    # and Vhwver its own upsert (int key).
    state_dims = [
        ("CONNECTION_STATE", "Vconnectionstate", "Connection state"),
        ("CONFIG_STATUS", "Vconfigstatus", "Config status"),
        ("IN_POWER_STATE", "Vmpwrstate", "Powerstate"),
        ("IN_GUEST_STATE", "Vmpgueststate", "Guest state"),
        ("HEARTBEAT", "Vmheartbeat", "Heartbeat"),
    ]
    os_dims = [("OS_VIA_TOOLS", "OS according to the VMware Tools"),
               ("OS_VIA_CONFIG", "OS according to the configuration file")]
    _dims_tagged(
        store,
        row,
        [(label, _bt(col)) for _rel, label, col in state_dims]
        + [("Vmos", _bt(col)) for _rel, col in os_dims],
    )
    vm_key_sql = _key_sql("VM UUID", UID)
    rp_cond_sql = (
        f"{_bt('Resource pool')} IS NOT NULL "
        f"AND size(split({_bt('Resource pool')}, '/')) > 4"
    )
    fl_cond_sql = (
        f"{_bt('Folder')} IS NOT NULL AND size(split({_bt('Folder')}, '/')) > 2"
    )
    vcpu_name_sql = _Raw("(concat(cast(CPUs AS string), ' vCPUs'))")
    fan = ", ".join(
        [
            f"struct('{rel}' AS r, '{label}' AS l, {_key_sql(col)} AS k)"
            for rel, label, col in state_dims
        ]
        + [f"struct('HAS_VCPUS' AS r, 'Vcpus' AS l, {_key_sql(vcpu_name_sql)} AS k)"]
        + [
            f"struct('{rel}' AS r, 'Vmos' AS l, {_key_sql(col)} AS k)"
            for rel, col in os_dims
        ]
        + [
            "struct('IN_RESOURCE_POOL' AS r, 'Vresourcepool' AS l, "
            f"CASE WHEN {rp_cond_sql} THEN "
            f"{_key_sql(SERVER, 'Resource pool')} END AS k)",
            "struct('IN_FOLDER' AS r, 'Vfolder' AS l, "
            f"CASE WHEN {fl_cond_sql} THEN {_key_sql('Folder')} END AS k)",
        ]
    )
    store.add_edges(
        row.selectExpr(
            "'Virtualmachine' AS src_label",
            f"{vm_key_sql} AS src_key",
            f"explode(array({fan})) AS __p",
        ).selectExpr(
            "src_label", "src_key",
            "__p.r AS rel_type", "__p.l AS dst_label", "__p.k AS dst_key",
        )
    )

    # Network #1-4 fan-out (:204-211): nulls coalesce to 'Not
    # Configured'; one explode replaces four per-column upsert+edge
    # rounds — the distinct over the exploded names equals the union
    # of the four per-column distincts, and duplicate edges collapse
    # in merge_edges.
    nets = ", ".join(
        f"coalesce({_bt(f'Network #{i}')}, 'Not Configured')" for i in (1, 2, 3, 4)
    )
    net_rows = row.selectExpr(
        f"{vm_key_sql} AS __vmk",
        f"{_bt(UID)} AS __uid",
        f"explode(array({nets})) AS __net",
    )
    store.upsert_nodes(
        "Vportgroup",
        net_rows.selectExpr("__net AS name", "__uid AS managedby").distinct(),
    )
    store.add_edges(
        net_rows.selectExpr(
            "'Virtualmachine' AS src_label",
            "__vmk AS src_key",
            "'IN_PORTGROUP' AS rel_type",
            "'Vportgroup' AS dst_label",
            f"{_key_sql('__net', '__uid')} AS dst_key",
        )
    )

    # hierarchy tail (:213-223) — all lookups against the store state
    # AFTER this stage's upserts (Cypher sees its own MERGEs)
    folders = store.vertices("Vfolder").select(F.col("path").alias("__flpath"))
    pools = store.vertices("Vresourcepool").select(
        F.col("vc").alias("__rpvc"), F.col("path").alias("__rppath")
    )
    vdc = store.vertices("Vspheredatacenter").select(
        F.col("name").alias("__dcname"), F.col("managedby").alias("__dcuid")
    )
    vcc = store.vertices("Vcentercluster").select(
        F.col("name").alias("__ccname"), F.col("managedby").alias("__ccuid")
    )

    t = (
        row.select(
            "*",
            vm_key.alias("__vmkey"),
            folder_head.alias("__fhead"),
            rp_cluster.alias("__rpcluster"),
        )
        # OPTIONAL MATCH vdc / vcc (:180-181)
        .join(vdc, (F.col("__fhead") == vdc.__dcname) & (F.col(UID) == vdc.__dcuid), "left")
        .join(vcc, (F.col("__rpcluster") == vcc.__ccname) & (F.col(UID) == vcc.__ccuid), "left")
        # OPTIONAL MATCH vfl {path:Folder} (:214)
        .join(folders, F.col("Folder") == folders.__flpath, "left")
        # OPTIONAL MATCH vrp {path:Resource pool} (:215) — scoped to vc
        .join(pools, (F.col("Resource pool") == pools.__rppath) & (F.col(SERVER) == pools.__rpvc), "left")
    )
    pf = pools.select(F.col("__rpvc").alias("__pvc"), F.col("__rppath").alias("__prppath"))
    ff = folders.select(F.col("__flpath").alias("__pflpath"))
    t = (
        t.withColumn("__flparent", F.when(F.col("__flpath").isNotNull(), path_parent("__flpath")))
        .withColumn("__rpparent", F.when(F.col("__rppath").isNotNull(), path_parent("__rppath")))
        # OPTIONAL MATCH parent folder / pool (:216-217)
        .join(ff, F.col("__flparent") == ff.__pflpath, "left")
        .join(pf, (F.col("__rpparent") == pf.__prppath) & (F.col(SERVER) == pf.__pvc), "left")
    )

    has_fl, has_pfl = "__flpath IS NOT NULL", "__pflpath IS NOT NULL"
    has_rp, has_prp = "__rppath IS NOT NULL", "__prppath IS NOT NULL"
    has_dc, has_cc = "__dcname IS NOT NULL", "__ccname IS NOT NULL"
    dc_key = _key_sql("__dcname", "__dcuid")
    cc_key = _key_sql("__ccname", "__ccuid")
    fl_key, pfl_key = _key_sql("__flpath"), _key_sql("__pflpath")
    rp_key = _key_sql(SERVER, "__rppath")
    prp_key = _key_sql(SERVER, "__prppath")

    # one tagged explode for the six hierarchy rels: src/dst label AND
    # src key ride as struct fields; a false OPTIONAL-MATCH condition
    # nulls both keys, which merge drops — identical rows to the six
    # former filter+select batches, one plan subtree + edge batch
    def _h(cond, sl, sk, r, dl, dk):
        return (
            f"struct('{sl}' AS sl, CASE WHEN {cond} THEN {sk} END AS sk, "
            f"'{r}' AS r, '{dl}' AS dl, CASE WHEN {cond} THEN {dk} END AS dk)"
        )

    hfan = ", ".join(
        [
            _h(f"{has_fl} AND {has_pfl}", "Vfolder", fl_key,
               "IN_FOLDER", "Vfolder", pfl_key),
            _h(f"{has_fl} AND NOT ({has_pfl}) AND {has_dc}", "Vfolder", fl_key,
               "LOCATED_IN_DC", "Vspheredatacenter", dc_key),
            _h(f"NOT ({has_fl}) AND {has_dc}", "Virtualmachine", "__vmkey",
               "LOCATED_IN_DC", "Vspheredatacenter", dc_key),
            _h(f"{has_rp} AND {has_prp}", "Vresourcepool", rp_key,
               "CHILD_RESOURCE_OF", "Vresourcepool", prp_key),
            _h(f"{has_cc} AND {has_rp} AND NOT ({has_prp})", "Vresourcepool", rp_key,
               "LOCATED_IN_CLUSTER", "Vcentercluster", cc_key),
            _h(f"{has_cc} AND NOT ({has_rp})", "Virtualmachine", "__vmkey",
               "LOCATED_IN_CLUSTER", "Vcentercluster", cc_key),
        ]
    )
    store.add_edges(
        t.selectExpr(f"explode(array({hfan})) AS __p").selectExpr(
            "__p.sl AS src_label",
            "__p.sk AS src_key",
            "__p.r AS rel_type",
            "__p.dl AS dst_label",
            "__p.dk AS dst_key",
        )
    )


# --------------------------------------------------------------------------
# Stage: vDatastore / vDisk / vNetwork / vPartition / vSnapshot
# --------------------------------------------------------------------------


def stage_vdatastore(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:228-240. Bug §0.2.4 (`ds.verion` typo) is
    fixed: the property is ``version``."""
    row = sheets["vDatastore"]
    vc = store.vertices("Vcenterserver").select(F.col("uid").alias("__vcuid"))
    j = row.join(vc, row[UID] == vc.__vcuid)
    ds_key = node_key(F.col("URL"))
    store.upsert_nodes(
        "Vdatastore",
        j.select(
            F.col("URL").alias("url"),
            F.col("Name").alias("name"),
            F.col("Accessible").alias("accessible"),
            F.col("Capacity MB").alias("capacity"),
            F.col("In Use MB").alias("inuse"),
            F.col("Free MB").alias("free"),
            F.col("# Hosts").alias("hosts"),
            F.col("Version").alias("version"),
            F.col("SIOC enabled").alias("sio"),
            F.col("# VMs").alias("vms"),
            F.col("Address").alias("address"),
            F.col(UID).alias("managedby"),
        ),
    )
    _dim(store, j, "Vconfigstatus", F.col("Config status"))
    store.add_edges(_edges(j, "Vdatastore", ds_key, "CONFIG_STATUS",
                           "Vconfigstatus", node_key(F.col("Config status"))))
    _dim(store, j, "Vdatastoretype", F.col("Type"))
    store.add_edges(_edges(j, "Vdatastore", ds_key, "DATASTORE_TYPE",
                           "Vdatastoretype", node_key(F.col("Type"))))
    # hosts explode + trim (:237-239) — join hosts by (trimmed name, uid)
    hosts = store.vertices("Vspherehost").select(
        F.col("name").alias("__hname"), F.col("managedby").alias("__huid"),
        node_key("objid", "managedby").alias("__hkey"),
    )
    exploded = (
        j.filter(F.col("Hosts").isNotNull())
        .select("URL", F.col(UID).alias("__uid"), F.explode(split_literal(F.col("Hosts"), ",")).alias("raw"))
        .select("URL", "__uid", F.trim("raw").alias("__hname"))
        .join(hosts, ["__hname"])
        .filter(F.col("__uid") == F.col("__huid"))
    )
    store.add_edges(_edges(exploded, "Vspherehost", F.col("__hkey"), "CONNECTED_DATASTORE",
                           "Vdatastore", node_key(F.col("URL"))))


def stage_vdisk(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:243-251: virtual disks + the datastore-name
    path parse ``[dsname] vm/vm.vmdk`` (§2.10-5) with the J5
    existence-qualified datastore join."""
    row = sheets["vDisk"]
    vms = store.vertices("Virtualmachine").select(
        F.col("uuid").alias("__vmuuid"), F.col("managedby").alias("__vmuid"),
        node_key("uuid", "managedby").alias("__vmkey"),
    )
    j = row.join(vms, (row["VM UUID"] == vms.__vmuuid) & (row[UID] == vms.__vmuid))
    vd_key = node_key(F.col("Path"))
    store.upsert_nodes(
        "Virtualdisk",
        j.select(
            F.col("Path").alias("path"),
            F.col("Disk").alias("disk"),
            F.col("Capacity MB").alias("capacity"),
            F.col("Thin").alias("thin"),
            F.col("Controller").alias("controller"),
            F.col("Disk Mode").alias("mode"),
            F.col("Eagerly Scrub").alias("eager"),
            F.col("Template").alias("template"),
        ),
    )
    store.add_edges(_edges(j, "Virtualdisk", vd_key, "VDISK_FOR_VM", "Virtualmachine", F.col("__vmkey")))
    # datastore name parse (:249): regexp_extract of the [bracket] head
    dsname = F.regexp_extract(F.col("Path"), r"^\[([^\]]*)\]", 1)
    # J5 (:250): ds {name,managedby} connected (any edge) to host {name:Host,managedby}
    ds = store.vertices("Vdatastore").select(
        F.col("name").alias("__dsname"), F.col("managedby").alias("__dsuid"),
        node_key("url").alias("__dskey"),
    )
    hosts = store.vertices("Vspherehost").select(
        F.col("name").alias("__hname"), F.col("managedby").alias("__huid2"),
        node_key("objid", "managedby").alias("__hkey2"),
    )
    e = store.edges().select("src_label", "src_key", "dst_label", "dst_key")
    sym = e.unionByName(e.select(
        F.col("dst_label").alias("src_label"), F.col("dst_key").alias("src_key"),
        F.col("src_label").alias("dst_label"), F.col("src_key").alias("dst_key"),
    ))
    ds_host = (
        sym.filter((F.col("src_label") == "Vdatastore") & (F.col("dst_label") == "Vspherehost"))
        .select(F.col("src_key").alias("__dskey"), F.col("dst_key").alias("__hkey2"))
        .distinct()
    )
    qualified = ds.join(ds_host, "__dskey").join(hosts, "__hkey2")
    withds = (
        j.select("Path", "Host", F.col(UID).alias("__uid"), vd_key.alias("__vdkey"), dsname.alias("__parsed_ds"))
        .join(
            qualified,
            (F.col("__parsed_ds") == qualified.__dsname)
            & (F.col("__uid") == qualified.__dsuid)
            & (F.col("Host") == qualified.__hname)
            & (F.col("__uid") == qualified.__huid2),
        )
        .select("__vdkey", "__dskey")
        .distinct()
    )
    store.add_edges(_edges(withds, "Virtualdisk", F.col("__vdkey"), "ON_DATASTORE",
                           "Vdatastore", F.col("__dskey")))


def stage_vnetwork(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:254-263."""
    row = sheets["vNetwork"]
    vms = store.vertices("Virtualmachine").select(
        F.col("uuid").alias("__vmuuid"), F.col("managedby").alias("__vmuid"),
        node_key("uuid", "managedby").alias("__vmkey"),
    )
    vc = store.vertices("Vcenterserver").select(F.col("name").alias("__vcname"))
    j = (
        row.join(vc, row[SERVER] == vc.__vcname)
        .join(vms, (row["VM UUID"] == vms.__vmuuid) & (row[UID] == vms.__vmuid))
    )
    ad_key = node_key(F.col("Mac Address"), F.col("VM UUID"))
    store.upsert_nodes(
        "Vmadapter",
        j.select(
            F.col("Mac Address").alias("mac"),
            F.col("VM UUID").alias("vmuuid"),
            F.col("Starts Connected").alias("startconnected"),
            F.col("IP Address").alias("ip"),
        ),
    )
    store.add_edges(_edges(j, "Vmadapter", ad_key, "ADAPTER_FOR", "Virtualmachine", F.col("__vmkey")))
    _dim(store, j, "Vmadaptertype", F.col("Adapter"))
    store.add_edges(_edges(j, "Vmadapter", ad_key, "ADAPTER_TYPE",
                           "Vmadaptertype", node_key(F.col("Adapter"))))
    # portgroup tail (:261-263): MATCH Vhostportgroup {name:Network,host,managedby}
    pg = store.vertices("Vhostportgroup").select(
        F.col("name").alias("__pgname"), F.col("host").alias("__pghost"), F.col("managedby").alias("__pguid"),
        node_key("name", "host", "managedby").alias("__pgkey"),
    )
    tail = j.join(
        pg,
        (j["Network"] == pg.__pgname) & (j["Host"] == pg.__pghost) & (j[UID] == pg.__pguid),
    )
    store.add_edges(_edges(tail, "Vmadapter", ad_key, "IN_PORTGROUP", "Vhostportgroup", F.col("__pgkey")))


def stage_vpartition(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:266-270."""
    row = sheets["vPartition"]
    vms = store.vertices("Virtualmachine").select(
        F.col("uuid").alias("__vmuuid"), F.col("managedby").alias("__vmuid"),
        node_key("uuid", "managedby").alias("__vmkey"),
    )
    vc = store.vertices("Vcenterserver").select(F.col("name").alias("__vcname"))
    j = (
        row.join(vc, row[SERVER] == vc.__vcname)
        .join(vms, (row["VM UUID"] == vms.__vmuuid) & (row[UID] == vms.__vmuid))
    )
    store.upsert_nodes(
        "Vpartition",
        j.select(
            F.col("Disk").alias("disk"),
            F.col("VM UUID").alias("vmuuid"),
            F.col("Capacity MB").alias("capacity"),
            F.col("Consumed MB").alias("consumed"),
            F.col("Free %").alias("free"),
        ),
    )
    store.add_edges(_edges(j, "Vpartition", node_key(F.col("Disk"), F.col("VM UUID")),
                           "PARTITION_FOR", "Virtualmachine", F.col("__vmkey")))


def stage_vsnapshot(store: GraphStore, sheets: Mapping[str, DataFrame]) -> None:
    """refresh-vmware.cypher:273-277."""
    row = sheets["vSnapshot"]
    vms = store.vertices("Virtualmachine").select(
        F.col("uuid").alias("__vmuuid"), F.col("managedby").alias("__vmuid"),
        node_key("uuid", "managedby").alias("__vmkey"),
    )
    vc = store.vertices("Vcenterserver").select(F.col("name").alias("__vcname"))
    j = (
        row.join(vc, row[SERVER] == vc.__vcname)
        .join(vms, (row["VM UUID"] == vms.__vmuuid) & (row[UID] == vms.__vmuid))
    )
    store.upsert_nodes(
        "Vsnapshot",
        j.select(
            F.col("Name").alias("name"),
            F.col("VM UUID").alias("vmuuid"),
            F.col("Description").alias("description"),
            F.col("Date / time").alias("timestamp"),
            F.col("Size MB (total)").alias("size"),
        ),
    )
    store.add_edges(_edges(j, "Vsnapshot", node_key(F.col("Name"), F.col("VM UUID")),
                           "SNAPSHOT_OF", "Virtualmachine", F.col("__vmkey")))


# The reference's statement order (pass 1) — later stages join against
# nodes earlier stages created.
STAGES = [
    stage_vcluster,
    stage_vcenter_version,
    stage_vrp,
    stage_vhost,
    stage_ntp,
    stage_dns,
    stage_vswitch,
    stage_vport,
    stage_vnic,
    stage_vinfo_vms,
    stage_vdatastore,
    stage_vdisk,
    stage_vnetwork,
    stage_vpartition,
    stage_vsnapshot,
]

# Sheet each stage consumes — ``run_ingest`` skips stages whose sheet
# the workbook doesn't carry, exactly as the reference's per-sheet
# apoc.load.xls statements simply find nothing to load (and as
# ``read_workbook_dir`` omits absent sheets).
STAGE_SHEETS: dict = {
    stage_vcluster: "vCluster",
    stage_vcenter_version: "vInfo",
    stage_vrp: "vRP",
    stage_vhost: "vHost",
    stage_ntp: "vHost",
    stage_dns: "vHost",
    stage_vswitch: "vSwitch",
    stage_vport: "vPort",
    stage_vnic: "vNIC",
    stage_vinfo_vms: "vInfo",
    stage_vdatastore: "vDatastore",
    stage_vdisk: "vDisk",
    stage_vnetwork: "vNetwork",
    stage_vpartition: "vPartition",
    stage_vsnapshot: "vSnapshot",
}
