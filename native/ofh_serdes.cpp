// Open Fronthaul U-plane message (de)serialization: eCPRI framing + O-RAN
// CUS-style radio application/section headers + BFP-compressed PRB payload.
//
// TPU-native counterpart of the reference's lib/ofh/{ecpri,serdes}
// (eCPRI packet builder/decoder, ORAN U-plane packet (de)builders): the
// host NIC-facing byte work stays native; the device only sees grids.
//
// Message layout (big-endian on the wire):
//   eCPRI common header (4B): 0x10 | msgtype(0=IQ data) | payload size
//   eCPRI PC_ID (2B) | SEQ_ID (2B)
//   Radio app header (4B): dataDirection(1b) payloadVersion(3b)
//     filterIndex(4b) | frameId(8b) | subframeId(4b) slotId(6b) symbolId(6b)
//   Section header (4B): sectionId(12b) rb(1b) symInc(1b) startPrb(10b)
//     numPrb(8b)
//   udCompHdr (1B): iqWidth(4b) compMeth(4b; 1 = BFP) + 1B reserved
//   numPrb x BFP-compressed PRB blocks (1B exponent + 24 mantissas)

#include <cstdint>
#include <cstring>

extern "C" {
int bfp_compressed_prb_bytes(int width);
void bfp_compress(const int16_t* samples, int nof_prb, int width, uint8_t* out);
void bfp_decompress(const uint8_t* in, int nof_prb, int width, int16_t* samples);
}

namespace {

inline void put16(uint8_t* p, uint16_t v) {
  p[0] = static_cast<uint8_t>(v >> 8);
  p[1] = static_cast<uint8_t>(v & 0xFF);
}
inline uint16_t get16(const uint8_t* p) {
  return static_cast<uint16_t>((p[0] << 8) | p[1]);
}

constexpr int kEcpriHdr = 8;
constexpr int kRadioHdr = 4;
constexpr int kSectionHdr = 4;
constexpr int kCompHdr = 2;

}  // namespace

extern "C" {

// Total serialized size for numPrb PRBs at iq width `width`.
int ofh_uplane_size(int nof_prb, int width) {
  return kEcpriHdr + kRadioHdr + kSectionHdr + kCompHdr +
         nof_prb * bfp_compressed_prb_bytes(width);
}

// Build one U-plane message.  iq: int16 interleaved, nof_prb*24 values.
// Returns bytes written, or -1.
int ofh_uplane_build(uint8_t* out, int out_cap, uint16_t pc_id, uint16_t seq_id,
                     int direction, int frame_id, int subframe_id, int slot_id,
                     int symbol_id, int start_prb, int nof_prb, int width,
                     const int16_t* iq) {
  const int total = ofh_uplane_size(nof_prb, width);
  if (out_cap < total || nof_prb > 255 || width < 1 || width > 16) return -1;
  uint8_t* p = out;
  // eCPRI common header.
  p[0] = 0x10;  // protocol revision 1, C = 0
  p[1] = 0x00;  // message type 0: IQ data
  put16(p + 2, static_cast<uint16_t>(total - 4));
  put16(p + 4, pc_id);
  put16(p + 6, seq_id);
  p += kEcpriHdr;
  // Radio application header.
  p[0] = static_cast<uint8_t>(((direction & 1) << 7) | (1 << 4));  // payloadVersion=1
  p[1] = static_cast<uint8_t>(frame_id & 0xFF);
  p[2] = static_cast<uint8_t>(((subframe_id & 0xF) << 4) | ((slot_id >> 2) & 0xF));
  p[3] = static_cast<uint8_t>(((slot_id & 0x3) << 6) | (symbol_id & 0x3F));
  p += kRadioHdr;
  // Section header (sectionId = 0, rb = 0, symInc = 0).
  p[0] = 0;
  p[1] = static_cast<uint8_t>((start_prb >> 8) & 0x3);
  p[2] = static_cast<uint8_t>(start_prb & 0xFF);
  p[3] = static_cast<uint8_t>(nof_prb & 0xFF);
  p += kSectionHdr;
  // udCompHdr: iqWidth | compMeth = 1 (BFP).
  p[0] = static_cast<uint8_t>(((width & 0xF) << 4) | 0x1);
  p[1] = 0;
  p += kCompHdr;
  bfp_compress(iq, nof_prb, width, p);
  return total;
}

// Parse one U-plane message.  Outputs scalars via pointers; decompresses the
// IQ into `iq` (caller provides nof_prb*24 int16 capacity; pass the value
// from a first parse with iq == nullptr to size it).
// Returns number of PRBs, or -1 on malformed input.
int ofh_uplane_parse(const uint8_t* in, int in_len, uint16_t* pc_id, uint16_t* seq_id,
                     int* direction, int* frame_id, int* subframe_id, int* slot_id,
                     int* symbol_id, int* start_prb, int* width, int16_t* iq) {
  if (in_len < kEcpriHdr + kRadioHdr + kSectionHdr + kCompHdr) return -1;
  if ((in[0] & 0xF0) != 0x10 || in[1] != 0x00) return -1;
  const int payload = get16(in + 2);
  if (payload + 4 > in_len) return -1;
  *pc_id = get16(in + 4);
  *seq_id = get16(in + 6);
  const uint8_t* p = in + kEcpriHdr;
  *direction = (p[0] >> 7) & 1;
  *frame_id = p[1];
  *subframe_id = (p[2] >> 4) & 0xF;
  *slot_id = ((p[2] & 0xF) << 2) | ((p[3] >> 6) & 0x3);
  *symbol_id = p[3] & 0x3F;
  p += kRadioHdr;
  *start_prb = ((p[1] & 0x3) << 8) | p[2];
  const int nof_prb = p[3];
  p += kSectionHdr;
  *width = (p[0] >> 4) & 0xF;
  const int comp_meth = p[0] & 0xF;
  if (comp_meth != 1) return -1;  // only BFP supported
  p += kCompHdr;
  const int need = nof_prb * bfp_compressed_prb_bytes(*width);
  if (p + need > in + in_len) return -1;
  if (iq != nullptr) bfp_decompress(p, nof_prb, *width, iq);
  return nof_prb;
}

}  // extern "C"
