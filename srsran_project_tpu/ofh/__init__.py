"""Open Fronthaul (split 7.2) host-side subsystem.

Counterpart of the reference's lib/ofh (SURVEY.md section 2.5): the
eCPRI/ORAN C+U-plane serdes and BFP compression live in native C++
(native/ofh_serdes.cpp, native/bfp.cpp via support.native); this package
adds the Ethernet/VLAN framing and the receiver-side protections (rx
window checker, sequence-id checker).  DPDK and NIC I/O are hardware-
facing and out of scope; the UDP IQ transport stands in for the wire.
"""
