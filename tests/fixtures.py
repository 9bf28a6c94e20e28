"""Synthetic RVTools workbook fixtures (FIXTURES.md), deterministic.

Workbook A covers every join/branch in SURVEY §2: two tenants, nested
resource pools, the IP-vs-FQDN trap entries, coalesce defaults, the
Jumboframes theta join, dropped-row violations (unknown cluster/host/VM,
unseeded domain). Workbook A′ = A minus one host, one VM, one datastore,
plus one new VM — drives the mark-and-sweep golden.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import DoubleType, IntegerType, StringType, StructField, StructType

_T = {"s": StringType(), "i": IntegerType(), "d": DoubleType()}


def _sheet(spark: SparkSession, spec: list[tuple[str, str]], rows: list[dict]):
    schema = StructType([StructField(n, _T[t], True) for n, t in spec])
    data = [tuple(r.get(n) for n, _ in spec) for r in rows]
    return spark.createDataFrame(data, schema)


VC1, VC2 = "uid-1", "uid-2"
SRV1, SRV2 = "vcenter1.example", "vcenter2.example"


def workbook(spark: SparkSession, variant: str = "A") :
    """variant 'A' (full) or 'Aprime' (minus host-3 / vm-2 / ds3, plus vm-7)."""
    prime = variant == "Aprime"

    vcluster = _sheet(
        spark,
        [("VI SDK UUID", "s"), ("VI SDK Server", "s"), ("Name", "s"), ("OverallStatus", "s"),
         ("TotalCpu", "d"), ("NumCpuCores", "i"), ("TotalMemory", "d"),
         ("HA enabled", "s"), ("DRS enabled", "s")],
        [
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "Name": "ClusterA", "OverallStatus": "green",
             "TotalCpu": 96000.0, "NumCpuCores": 48, "TotalMemory": 8.0e11, "HA enabled": "True", "DRS enabled": "True"},
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "Name": "ClusterB", "OverallStatus": "yellow",
             "TotalCpu": 48000.0, "NumCpuCores": 24, "TotalMemory": 4.0e11, "HA enabled": "False", "DRS enabled": "True"},
            {"VI SDK UUID": VC2, "VI SDK Server": SRV2, "Name": "ClusterC", "OverallStatus": "red",
             "TotalCpu": 24000.0, "NumCpuCores": 12, "TotalMemory": 2.0e11, "HA enabled": "True", "DRS enabled": "False"},
        ],
    )

    host_cols = [
        ("VI SDK UUID", "s"), ("VI SDK Server", "s"), ("Object ID", "s"), ("Host", "s"),
        ("Cluster", "s"), ("Config status", "s"), ("NumHosts", "i"), ("# CPU", "i"),
        ("# Cores", "i"), ("# Memory", "d"), ("Memory usage %", "d"), ("# VMs", "i"),
        ("Assigned License(s)", "s"), ("Max EVC", "s"), ("Boot time", "s"), ("Service tag", "s"),
        ("Current CPU power man. policy", "s"), ("Host Power Policy", "s"), ("CPU Model", "s"),
        ("ESX Version", "s"), ("Vendor", "s"), ("Model", "s"), ("BIOS Version", "s"),
        ("BIOS Date", "s"), ("Domain", "s"), ("NTP Server(s)", "s"), ("DNS Servers", "s"),
    ]

    def host(objid, name, cluster, uid, srv, **kw):
        base = {
            "VI SDK UUID": uid, "VI SDK Server": srv, "Object ID": objid, "Host": name,
            "Cluster": cluster, "Config status": "green", "NumHosts": 1, "# CPU": 2,
            "# Cores": 32, "# Memory": 5.0e11, "Memory usage %": 42.5, "# VMs": 10,
            "Assigned License(s)": "vSphere Ent", "Max EVC": "intel-broadwell",
            "Boot time": "2024-01-01 00:00:00", "Service tag": f"ST-{objid}",
            "Current CPU power man. policy": "Balanced", "Host Power Policy": "Balanced",
            "CPU Model": "Intel Xeon Gold 6142",
            "ESX Version": "VMware ESXi 6.7.0 build-15160138",
            "Vendor": "Dell Inc.", "Model": "PowerEdge R740", "BIOS Version": "2.11.2",
            "BIOS Date": "2021-03-15", "Domain": "corp.example",
            "NTP Server(s)": "10.0.0.1, ntp1.corp.example", "DNS Servers": "8.8.8.8,dns1.corp.example",
        }
        base.update(kw)
        return base

    hosts = [
        host("host-1", "esx1.example", "ClusterA", VC1, SRV1,
             **{"DNS Servers": "8.8.8.8,dns1.corp.example , 10.0.0.1x"}),  # '10.0.0.1x' → fqdn trap
        host("host-2", "esx2.example", "ClusterA", VC1, SRV1,
             **{"Domain": "other.example", "Vendor": None, "Model": None,
                "NTP Server(s)": None, "DNS Servers": "1.2.3.4"}),
        host("host-4", "esx4.example", "ClusterC", VC2, SRV2,
             **{"ESX Version": "VMware ESXi 7.0.3 build-20328353"}),
        host("host-5", "esx5.example", "ClusterX", VC1, SRV1),  # unknown cluster → dropped
    ]
    if not prime:
        hosts.insert(2, host("host-3", "esx3.example", "ClusterB", VC1, SRV1,
                             **{"NTP Server(s)": "256.1.1.1", "BIOS Version": None,
                                "DNS Servers": None}))
    vhost = _sheet(spark, host_cols, hosts)

    vrp = _sheet(
        spark,
        [("VI SDK UUID", "s"), ("VI SDK Server", "s"), ("Resource pool", "s"),
         ("# VMs", "i"), ("# vCPUs", "i"), ("Mem Configured", "d")],
        [
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "Resource pool": "/DC1/ClusterA/Resources",
             "# VMs": 20, "# vCPUs": 40, "Mem Configured": 1.0e11},
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "Resource pool": "/DC1/ClusterA/Resources/prod",
             "# VMs": 12, "# vCPUs": 24, "Mem Configured": 6.0e10},
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "Resource pool": "/DC1/ClusterA/Resources/prod/web",
             "# VMs": 6, "# vCPUs": 12, "Mem Configured": 3.0e10},
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "Resource pool": "/DC1/ClusterB/Resources/dev",
             "# VMs": 5, "# vCPUs": 10, "Mem Configured": 2.0e10},
            {"VI SDK UUID": VC2, "VI SDK Server": SRV2, "Resource pool": "/DC2/ClusterC/Resources/test",
             "# VMs": 3, "# vCPUs": 6, "Mem Configured": 1.0e10},
        ],
    )

    info_cols = [
        ("VI SDK UUID", "s"), ("VI SDK Server", "s"), ("VI SDK Server type", "s"),
        ("VM UUID", "s"), ("VM", "s"), ("VM ID", "s"), ("DNS Name", "s"), ("PowerOn", "s"),
        ("Change Version", "s"), ("Annotation", "s"), ("Consolidation Needed", "s"),
        ("CPUs", "i"), ("Memory", "s"), ("NICs", "s"), ("Disks", "s"), ("CBT", "s"),
        ("HW version", "s"), ("HW upgrade status", "s"), ("Connection state", "s"),
        ("Config status", "s"), ("Powerstate", "s"), ("Guest state", "s"), ("Heartbeat", "s"),
        ("Resource pool", "s"), ("Folder", "s"),
        ("OS according to the VMware Tools", "s"), ("OS according to the configuration file", "s"),
        ("Network #1", "s"), ("Network #2", "s"), ("Network #3", "s"), ("Network #4", "s"),
    ]
    stype1 = "VMware vCenter Server 6.7.0 build-14836122"
    stype2 = "VMware vCenter Server 7.0.3 build-20150588"

    def vm(uuid, name, uid, srv, stype, **kw):
        base = {
            "VI SDK UUID": uid, "VI SDK Server": srv, "VI SDK Server type": stype,
            "VM UUID": uuid, "VM": name, "VM ID": f"vm-{name}", "DNS Name": f"{name}.corp.example",
            "PowerOn": "2024-02-01 08:00:00", "Change Version": "2024-02-01T08:00:00Z",
            "Annotation": f"{name} annotation", "Consolidation Needed": "False",
            "CPUs": 4, "Memory": "8192", "NICs": "1", "Disks": "1", "CBT": "True",
            "HW version": "14", "HW upgrade status": "none", "Connection state": "connected",
            "Config status": "green", "Powerstate": "poweredOn", "Guest state": "running",
            "Heartbeat": "green", "Resource pool": None, "Folder": None,
            "OS according to the VMware Tools": "CentOS 7", "OS according to the configuration file": "centos7-64",
            "Network #1": None, "Network #2": None, "Network #3": None, "Network #4": None,
        }
        base.update(kw)
        return base

    vms = [
        vm("vm-uuid-1", "web01", VC1, SRV1, stype1,
           **{"Resource pool": "/DC1/ClusterA/Resources/prod/web", "Folder": "/DC1/Web",
              "Network #1": "PG-Web", "Network #2": "PG-DB"}),
        vm("vm-uuid-3", "app01", VC1, SRV1, stype1,
           **{"Resource pool": "/DC1/ClusterB/Resources/dev/api", "Folder": "/DC1/Web/Frontend",
              "Network #1": "PG-Web"}),
        vm("vm-uuid-4", "solo01", VC1, SRV1, stype1,
           **{"Folder": "/DC1/Solo", "Memory": "notanum", "HW version": "13",
              "OS according to the VMware Tools": None}),
        vm("vm-uuid-5", "test01", VC2, SRV2, stype2,
           **{"Resource pool": "/DC2/ClusterC/Resources/test", "CPUs": None,
              "Powerstate": "poweredOff", "Guest state": "notRunning"}),
        # duplicate input row for the same VM (intra-batch dedup)
        vm("vm-uuid-6", "dup01", VC1, SRV1, stype1, **{"Annotation": "zz later row"}),
        vm("vm-uuid-6", "dup01", VC1, SRV1, stype1, **{"Annotation": "aa earlier row"}),
    ]
    if not prime:
        vms.insert(1, vm("vm-uuid-2", "db01", VC1, SRV1, stype1,
                         **{"Resource pool": "/DC1/ClusterA/Resources", "HW version": "11",
                            "HW upgrade status": "Pending"}))
    else:
        vms.append(vm("vm-uuid-7", "new01", VC1, SRV1, stype1,
                      **{"Resource pool": "/DC1/ClusterA/Resources/prod", "Folder": "/DC1/Web"}))
    vinfo = _sheet(spark, info_cols, vms)

    vswitch = _sheet(
        spark,
        [("VI SDK UUID", "s"), ("Host", "s"), ("Cluster", "s"), ("Switch", "s"),
         ("# Ports", "i"), ("Free Ports", "i"), ("Promiscuous Mode", "s"), ("Mac Changes", "s"),
         ("Forged Transmits", "s"), ("Traffic Shaping", "s"), ("Notify Switch", "s"),
         ("MTU", "s"), ("Policy", "s"), ("Offload", "s")],
        [
            {"VI SDK UUID": VC1, "Host": "esx1.example", "Cluster": "ClusterA", "Switch": "vSwitch0",
             "# Ports": 128, "Free Ports": 100, "Promiscuous Mode": "Reject", "Mac Changes": "Reject",
             "Forged Transmits": "Reject", "Traffic Shaping": "False", "Notify Switch": "True",
             "MTU": "9000", "Policy": "loadbalance_srcid", "Offload": "True"},
            {"VI SDK UUID": VC1, "Host": "esx2.example", "Cluster": "ClusterA", "Switch": "vSwitch0",
             "# Ports": 128, "Free Ports": 90, "Promiscuous Mode": "Accept", "Mac Changes": "Reject",
             "Forged Transmits": "Accept", "Traffic Shaping": "False", "Notify Switch": "True",
             "MTU": "1500", "Policy": None, "Offload": "False"},
            {"VI SDK UUID": VC1, "Host": "esx5.example", "Cluster": "ClusterA", "Switch": "vSwitch0",
             "# Ports": 64, "Free Ports": 60, "Promiscuous Mode": "Reject", "Mac Changes": "Reject",
             "Forged Transmits": "Reject", "Traffic Shaping": "False", "Notify Switch": "True",
             "MTU": "1500", "Policy": "loadbalance_ip", "Offload": "True"},  # host dropped earlier
        ],
    )

    vport = _sheet(
        spark,
        [("VI SDK UUID", "s"), ("Host", "s"), ("Cluster", "s"), ("Switch", "s"),
         ("Port Group", "s"), ("Policy", "s"), ("VLAN", "s"), ("Promiscuous Mode", "s"),
         ("Mac Changes", "s"), ("Forged Transmits", "s"), ("Traffic Shaping", "s")],
        [
            {"VI SDK UUID": VC1, "Host": "esx1.example", "Cluster": "ClusterA", "Switch": "vSwitch0",
             "Port Group": "PG-Web", "Policy": "loadbalance_srcid", "VLAN": "10",
             "Promiscuous Mode": "Reject", "Mac Changes": "Reject", "Forged Transmits": "Reject",
             "Traffic Shaping": "False"},
            {"VI SDK UUID": VC1, "Host": "esx2.example", "Cluster": "ClusterA", "Switch": "vSwitch0",
             "Port Group": "PG-DB", "Policy": None, "VLAN": "20",
             "Promiscuous Mode": "Reject", "Mac Changes": "Accept", "Forged Transmits": "Reject",
             "Traffic Shaping": "False"},
            {"VI SDK UUID": VC1, "Host": "esx1.example", "Cluster": "ClusterA", "Switch": "vSwitchX",
             "Port Group": "PG-Ghost", "Policy": "p", "VLAN": "30",
             "Promiscuous Mode": "Reject", "Mac Changes": "Reject", "Forged Transmits": "Reject",
             "Traffic Shaping": "False"},  # unknown switch → dropped
        ],
    )

    vnic = _sheet(
        spark,
        [("VI SDK UUID", "s"), ("Host", "s"), ("Cluster", "s"), ("Switch", "s"),
         ("Network Device", "s"), ("Driver", "s"), ("Speed", "s"), ("MAC", "s"),
         ("WakeOn", "s"), ("PCI", "s")],
        [
            {"VI SDK UUID": VC1, "Host": "esx1.example", "Cluster": "ClusterA", "Switch": "vSwitch0",
             "Network Device": "vmnic0", "Driver": "ixgbe", "Speed": "10000 Mb",
             "MAC": "aa:bb:cc:00:00:01", "WakeOn": "False", "PCI": "0000:01:00.0"},
            {"VI SDK UUID": VC1, "Host": "esx2.example", "Cluster": "ClusterA", "Switch": "vSwitch0",
             "Network Device": "vmnic0", "Driver": None, "Speed": None,
             "MAC": "aa:bb:cc:00:00:02", "WakeOn": "False", "PCI": "0000:01:00.0"},
        ],
    )

    datastores = [
        {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "URL": "ds:///vmfs/volumes/aaa/", "Name": "DS-A",
         "Accessible": "True", "Capacity MB": 1048576.0, "In Use MB": 524288.0, "Free MB": 524288.0,
         "# Hosts": 2, "# VMs": 10, "Version": "6.81", "SIOC enabled": "False", "Address": "",
         "Config status": "green", "Type": "VMFS", "Hosts": "esx1.example, esx2.example"},
        {"VI SDK UUID": VC2, "VI SDK Server": SRV2, "URL": "ds:///vmfs/volumes/bbb/", "Name": "DS-B",
         "Accessible": "True", "Capacity MB": 2097152.0, "In Use MB": 1048576.0, "Free MB": 1048576.0,
         "# Hosts": 1, "# VMs": 3, "Version": "6.81", "SIOC enabled": "True", "Address": "nfs1:/vol",
         "Config status": "green", "Type": "NFS", "Hosts": "esx4.example"},
    ]
    if not prime:
        datastores.append(
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "URL": "ds:///vmfs/volumes/ccc/", "Name": "DS-C",
             "Accessible": "False", "Capacity MB": 524288.0, "In Use MB": 262144.0, "Free MB": 262144.0,
             "# Hosts": 0, "# VMs": 0, "Version": "5.61", "SIOC enabled": "False", "Address": "",
             "Config status": "gray", "Type": "VMFS", "Hosts": "esx9.example"}  # unknown host
        )
    vdatastore = _sheet(
        spark,
        [("VI SDK UUID", "s"), ("VI SDK Server", "s"), ("URL", "s"), ("Name", "s"),
         ("Accessible", "s"), ("Capacity MB", "d"), ("In Use MB", "d"), ("Free MB", "d"),
         ("# Hosts", "i"), ("# VMs", "i"), ("Version", "s"), ("SIOC enabled", "s"),
         ("Address", "s"), ("Config status", "s"), ("Type", "s"), ("Hosts", "s")],
        datastores,
    )

    disks = [
        {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "VM UUID": "vm-uuid-1",
         "Path": "[DS-A] web01/web01.vmdk", "Disk": "Hard disk 1", "Capacity MB": 40960.0,
         "Thin": "True", "Controller": "SCSI controller 0", "Disk Mode": "persistent",
         "Eagerly Scrub": "False", "Template": "False", "Host": "esx1.example"},
        {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "VM UUID": "vm-uuid-9",  # unknown VM → dropped
         "Path": "[DS-A] ghost/ghost.vmdk", "Disk": "Hard disk 1", "Capacity MB": 1024.0,
         "Thin": "True", "Controller": "SCSI controller 0", "Disk Mode": "persistent",
         "Eagerly Scrub": "False", "Template": "False", "Host": "esx1.example"},
    ]
    if not prime:
        disks.append(
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "VM UUID": "vm-uuid-2",
             "Path": "[DS-C] db01/db01.vmdk", "Disk": "Hard disk 1", "Capacity MB": 81920.0,
             "Thin": "False", "Controller": "SCSI controller 0", "Disk Mode": "persistent",
             "Eagerly Scrub": "True", "Template": "False", "Host": "esx1.example"}  # DS-C not on esx1
        )
    vdisk = _sheet(
        spark,
        [("VI SDK UUID", "s"), ("VI SDK Server", "s"), ("VM UUID", "s"), ("Path", "s"),
         ("Disk", "s"), ("Capacity MB", "d"), ("Thin", "s"), ("Controller", "s"),
         ("Disk Mode", "s"), ("Eagerly Scrub", "s"), ("Template", "s"), ("Host", "s")],
        disks,
    )

    vnetwork = _sheet(
        spark,
        [("VI SDK UUID", "s"), ("VI SDK Server", "s"), ("VM UUID", "s"), ("Mac Address", "s"),
         ("Adapter", "s"), ("Starts Connected", "s"), ("IP Address", "s"), ("Network", "s"),
         ("Host", "s")],
        [
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "VM UUID": "vm-uuid-1",
             "Mac Address": "00:50:56:aa:bb:01", "Adapter": "VMXNET3", "Starts Connected": "True",
             "IP Address": "192.168.10.11", "Network": "PG-Web", "Host": "esx1.example"},
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "VM UUID": "vm-uuid-1",
             "Mac Address": "00:50:56:aa:bb:02", "Adapter": "E1000", "Starts Connected": "False",
             "IP Address": None, "Network": "PG-Missing", "Host": "esx1.example"},  # no such PG
        ],
    )

    vpartition = _sheet(
        spark,
        [("VI SDK UUID", "s"), ("VI SDK Server", "s"), ("VM UUID", "s"), ("Disk", "s"),
         ("Capacity MB", "d"), ("Consumed MB", "d"), ("Free %", "d")],
        [
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "VM UUID": "vm-uuid-1", "Disk": "/",
             "Capacity MB": 20480.0, "Consumed MB": 10240.0, "Free %": 50.0},
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "VM UUID": "vm-uuid-1", "Disk": "/var",
             "Capacity MB": 10240.0, "Consumed MB": 1024.0, "Free %": 90.0},
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "VM UUID": "vm-uuid-9", "Disk": "/",
             "Capacity MB": 1.0, "Consumed MB": 1.0, "Free %": 0.0},  # unknown VM → dropped
        ],
    )

    vsnapshot = _sheet(
        spark,
        [("VI SDK UUID", "s"), ("VI SDK Server", "s"), ("VM UUID", "s"), ("Name", "s"),
         ("Description", "s"), ("Date / time", "s"), ("Size MB (total)", "d")],
        [
            {"VI SDK UUID": VC1, "VI SDK Server": SRV1, "VM UUID": "vm-uuid-1",
             "Name": "before-upgrade", "Description": "pre-upgrade checkpoint",
             "Date / time": "2024-01-15 12:00:00", "Size MB (total)": 2048.0},
        ],
    )

    return {
        "vCluster": vcluster, "vInfo": vinfo, "vRP": vrp, "vHost": vhost,
        "vSwitch": vswitch, "vPort": vport, "vNIC": vnic, "vNetwork": vnetwork,
        "vDatastore": vdatastore, "vDisk": vdisk, "vPartition": vpartition,
        "vSnapshot": vsnapshot,
    }


def seeds(spark: SparkSession):
    clientdomain = spark.createDataFrame([("corp.example",)], ["name"])
    company = spark.createDataFrame([("Acme Corp",)], ["name"])
    jumbo = spark.createDataFrame([("enabled",)], ["name"])
    seed_edges = spark.createDataFrame(
        [("Clientdomain", "corp.example", "OF_COMPANY", "Company", "Acme Corp")],
        ["src_label", "src_key", "rel_type", "dst_label", "dst_key"],
    )
    return {
        "clientdomain": clientdomain,
        "company": company,
        "jumboframes": jumbo,
        "seed_edges": seed_edges,
    }
