// Round-5 golden-suite tail (SURVEY Appendix A / VERDICT r4 missing #3):
// standalone uci_decoder, transform_precoder, and dmrs_pusch estimator
// suites, driving the reference implementations end to end.

#include "common.h"

#include "lib/phy/upper/channel_coding/crc_calculator_generic_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_allocator_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_code_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_deallocator_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_decoder_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_encoder_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_rate_dematcher_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_rate_matcher_impl.h"
#include "lib/phy/upper/channel_coding/short/short_block_detector_impl.h"
#include "lib/phy/upper/channel_coding/short/short_block_encoder_impl.h"
#include "lib/phy/upper/channel_processors/uci/uci_decoder_impl.h"
#include "lib/phy/generic_functions/dft_processor_generic_impl.h"
#include "lib/phy/generic_functions/transform_precoding/transform_precoder_dft_impl.h"
#include "lib/phy/support/interpolator/interpolator_linear_impl.h"
#include "lib/phy/support/time_alignment_estimator/time_alignment_estimator_dft_impl.h"
#include "lib/phy/upper/sequence_generators/low_papr_sequence_generator_impl.h"
#include "lib/phy/upper/sequence_generators/pseudo_random_generator_impl.h"
#include "lib/phy/upper/signal_processors/channel_estimator/port_channel_estimator_average_impl.h"
#include "lib/phy/upper/signal_processors/pusch/dmrs_pusch_estimator_impl.h"
#include "srsran/phy/support/resource_grid_reader.h"
#include "srsran/phy/upper/channel_estimation.h"
#include "srsran/ran/sch/sch_dmrs_power.h"
#include "srsran/support/executors/task_executor.h"

#include <cmath>

using namespace srsran;
using namespace refgen;

extern std::string g_root_outdir;

namespace {

void start(const std::string& name) { set_outdir(g_root_outdir + "/" + name); }

// ----------------------------------------------------------- uci_decoder ---

std::unique_ptr<uci_decoder> make_uci_dec_tail() {
  return std::make_unique<uci_decoder_impl>(
      std::make_unique<short_block_detector_impl>(),
      std::make_unique<polar_code_impl>(),
      std::make_unique<polar_rate_dematcher_impl>(),
      std::make_unique<polar_decoder_impl>(std::make_unique<polar_encoder_impl>(),
                                           polar_code::NMAX_LOG),
      std::make_unique<polar_deallocator_impl>(),
      std::make_unique<crc_calculator_generic_impl>(crc_generator_poly::CRC6),
      std::make_unique<crc_calculator_generic_impl>(crc_generator_poly::CRC11));
}

// TX-side UCI encoder mirroring uci_decoder_impl's inverse chain
// (uci_decoder_impl.cpp:43-107): short block for A <= 11; otherwise
// CRC6/11 + polar(ibil) + rate match, 2 codeblocks with filler on the
// first when segmented.  (Same helper the pucch_format2 suite uses.)
std::vector<uint8_t> uci_encode_tail(span<const uint8_t> payload, unsigned E,
                                     modulation_scheme mod) {
  unsigned A = payload.size();
  std::vector<uint8_t> out(E);
  if (A <= 11) {
    short_block_encoder_impl sb;
    sb.encode(out, payload, mod);
    return out;
  }
  unsigned crc_size = (A >= 20) ? 11 : 6;
  bool segmented = (A >= 360 && E >= 1088) || (A >= 1013);
  unsigned nof_cb = segmented ? 2 : 1;
  crc_calculator_generic_impl crc6(crc_generator_poly::CRC6);
  crc_calculator_generic_impl crc11(crc_generator_poly::CRC11);
  crc_calculator& crc = (crc_size == 11) ? static_cast<crc_calculator&>(crc11)
                                         : static_cast<crc_calculator&>(crc6);
  polar_code_impl code;
  polar_allocator_impl allocator;
  polar_encoder_impl encoder;
  polar_rate_matcher_impl rm;
  unsigned cb0 = A / nof_cb;
  unsigned filler = A % nof_cb;
  unsigned pos_in = 0, pos_out = 0;
  for (unsigned i_cb = 0; i_cb != nof_cb; ++i_cb) {
    unsigned cb_msg = (i_cb == 0) ? cb0 : (A + nof_cb - 1) / nof_cb;
    unsigned cb_fill = (i_cb == 0) ? filler : 0;
    unsigned E_cb = E / nof_cb;
    unsigned K = cb_msg + cb_fill + crc_size;
    std::vector<uint8_t> a(K);
    for (unsigned j = 0; j != cb_fill; ++j) a[j] = 0;
    for (unsigned j = 0; j != cb_msg; ++j) a[cb_fill + j] = payload[pos_in + j];
    crc_calculator_checksum_t checksum =
        crc.calculate_bit(span<const uint8_t>(a.data(), cb_msg + cb_fill));
    for (unsigned j = 0; j != crc_size; ++j)
      a[cb_msg + cb_fill + j] = (checksum >> (crc_size - 1 - j)) & 1;
    code.set(K, E_cb, 10, polar_code_ibil::present);
    std::vector<uint8_t> allocated(code.get_N());
    allocator.allocate(allocated, a, code);
    std::vector<uint8_t> encoded(code.get_N());
    encoder.encode(encoded, allocated, code.get_n());
    std::vector<uint8_t> matched(E_cb);
    rm.rate_match(matched, encoded, code);
    std::copy(matched.begin(), matched.end(), out.begin() + pos_out);
    pos_in += cb_msg;
    pos_out += E_cb;
  }
  return out;
}

void gen_uci_decoder() {
  start("uci_decoder");
  manifest m("manifest.json");
  auto rng = make_rng(0x0C1D);
  std::normal_distribution<float> noise_d(0.f, 1.f);
  struct ucase { unsigned a, e; modulation_scheme mod; const char* mname; };
  std::vector<ucase> cases = {
      {1, 2, modulation_scheme::QPSK, "qpsk"},
      {1, 8, modulation_scheme::QAM256, "qam256"},
      {2, 6, modulation_scheme::QPSK, "qpsk"},
      {2, 16, modulation_scheme::QAM16, "qam16"},
      {5, 32, modulation_scheme::QPSK, "qpsk"},
      {11, 64, modulation_scheme::QPSK, "qpsk"},
      {12, 96, modulation_scheme::QPSK, "qpsk"},     // polar, CRC6
      {19, 120, modulation_scheme::QPSK, "qpsk"},    // polar, CRC6
      {20, 160, modulation_scheme::QPSK, "qpsk"},    // polar, CRC11
      {45, 250, modulation_scheme::QPSK, "qpsk"},
      {100, 500, modulation_scheme::QPSK, "qpsk"},
      {200, 800, modulation_scheme::QPSK, "qpsk"},
      {360, 1600, modulation_scheme::QPSK, "qpsk"},  // segmented (2 CBs)
      {500, 2048, modulation_scheme::QPSK, "qpsk"},  // segmented
      {1013, 3200, modulation_scheme::QPSK, "qpsk"}, // segmented by A
      {1200, 4096, modulation_scheme::QPSK, "qpsk"},
  };
  auto dec = make_uci_dec_tail();
  int idx = 0;
  for (const auto& c : cases) {
    auto payload = random_bits(rng, c.a);
    auto coded = uci_encode_tail(payload, c.e, c.mod);
    // LLRs at 8 dB, reference quantization convention (positive = bit 0).
    float sigma = std::pow(10.f, -8.f / 20.f);
    std::vector<log_likelihood_ratio> llrs(c.e);
    for (unsigned i = 0; i != c.e; ++i) {
      float x = (coded[i] ? -1.f : 1.f) + sigma * noise_d(rng);
      int q = (int)std::lround(2.f * x / (sigma * sigma) * 4.f);
      llrs[i] = std::max(-120, std::min(120, q));
    }
    std::vector<uint8_t> message(c.a);
    uci_decoder::configuration cfg;
    cfg.modulation = c.mod;
    uci_status status = dec->decode(message, llrs, cfg);
    std::string base = std::to_string(idx);
    write_dat("payload" + base + ".dat", payload);
    write_dat("coded" + base + ".dat", coded);
    write_dat("llrs" + base + ".dat",
              reinterpret_cast<const int8_t*>(llrs.data()), c.e);
    write_dat("message" + base + ".dat", message);
    m.begin_case();
    m.field("a", (long long)c.a);
    m.field("e", (long long)c.e);
    m.field("mod", std::string(c.mname));
    m.field("status", std::string(status == uci_status::valid
                                      ? "valid"
                                      : (status == uci_status::invalid
                                             ? "invalid" : "unknown")));
    m.field("idx", (long long)idx);
    m.end_case();
    ++idx;
  }
  m.flush();
}

// ------------------------------------------------------ transform_precoder --

void gen_transform_precoder() {
  start("transform_precoder");
  manifest m("manifest.json");
  auto rng = make_rng(0x7F9C);
  std::normal_distribution<float> nd(0.f, 1.f);
  transform_precoder_dft_impl::collection_dft_processors dfts;
  for (unsigned rb : {1u, 2u, 3u, 4u, 6u, 12u, 24u, 48u, 96u}) {
    dfts.emplace(rb, std::make_unique<dft_processor_generic_impl>(
                         dft_processor::configuration{rb * NRE,
                                                      dft_processor::direction::INVERSE}));
  }
  transform_precoder_dft_impl tp(std::move(dfts));
  int idx = 0;
  for (unsigned rb : {1u, 2u, 3u, 4u, 6u, 12u, 24u, 48u, 96u}) {
    unsigned m_sc = rb * NRE;
    std::vector<cf_t> x(m_sc), y(m_sc);
    for (auto& v : x) v = cf_t(nd(rng), nd(rng)) * 0.7071f;
    tp.deprecode_ofdm_symbol(y, x);
    std::vector<float> nvar_in(m_sc), nvar_out(m_sc);
    for (auto& v : nvar_in) v = 0.01f + 0.99f * std::abs(nd(rng));
    tp.deprecode_ofdm_symbol_noise(nvar_out, nvar_in);
    std::string base = std::to_string(idx);
    write_dat("in" + base + ".dat", reinterpret_cast<const float*>(x.data()),
              2 * m_sc);
    write_dat("out" + base + ".dat", reinterpret_cast<const float*>(y.data()),
              2 * m_sc);
    write_dat("nvar_in" + base + ".dat", nvar_in);
    write_dat("nvar_out" + base + ".dat", nvar_out);
    m.begin_case();
    m.field("nof_rb", (long long)rb);
    m.field("m_sc", (long long)m_sc);
    m.field("idx", (long long)idx);
    m.end_case();
    ++idx;
  }
  m.flush();
}

// ------------------------------------------------------------- dmrs_pusch --

class tail_grid : public resource_grid_reader {
public:
  tail_grid(unsigned ports, unsigned symbols, unsigned subc)
      : ports_(ports), symbols_(symbols), subc_(subc), data_(ports * symbols * subc) {}
  cbf16_t& at(unsigned p, unsigned l, unsigned k) {
    return data_[(p * symbols_ + l) * subc_ + k];
  }
  const cbf16_t& at(unsigned p, unsigned l, unsigned k) const {
    return data_[(p * symbols_ + l) * subc_ + k];
  }
  unsigned get_nof_ports() const override { return ports_; }
  unsigned get_nof_subc() const override { return subc_; }
  unsigned get_nof_symbols() const override { return symbols_; }
  bool is_empty(unsigned) const override { return false; }
  bool is_empty() const override { return false; }
  span<cf_t> get(span<cf_t> symbols, unsigned port, unsigned l, unsigned k_init,
                 const bounded_bitset<MAX_RB * NRE>& mask) const override {
    unsigned i = 0;
    for (unsigned k = 0; k != mask.size(); ++k)
      if (mask.test(k)) symbols[i++] = to_cf(at(port, l, k_init + k));
    return symbols.last(symbols.size() - i);
  }
  span<cbf16_t> get(span<cbf16_t> symbols, unsigned port, unsigned l, unsigned k_init,
                    const bounded_bitset<MAX_RB * NRE>& mask) const override {
    unsigned i = 0;
    for (unsigned k = 0; k != mask.size(); ++k)
      if (mask.test(k)) symbols[i++] = at(port, l, k_init + k);
    return symbols.last(symbols.size() - i);
  }
  void get(span<cf_t> symbols, unsigned port, unsigned l, unsigned k_init,
           unsigned stride) const override {
    for (unsigned i = 0; i != symbols.size(); ++i)
      symbols[i] = to_cf(at(port, l, k_init + i * stride));
  }
  void get(span<cbf16_t> symbols, unsigned port, unsigned l, unsigned k_init) const override {
    for (unsigned i = 0; i != symbols.size(); ++i) symbols[i] = at(port, l, k_init + i);
  }
  span<const cbf16_t> get_view(unsigned port, unsigned l) const override {
    return span<const cbf16_t>(&at(port, l, 0), subc_);
  }

private:
  unsigned ports_, symbols_, subc_;
  std::vector<cbf16_t> data_;
};

class tail_executor : public task_executor {
public:
  bool execute(unique_task task) override { task(); return true; }
  bool defer(unique_task task) override { task(); return true; }
};

class tail_notifier : public dmrs_pusch_estimator_notifier {
public:
  bool done = false;
  void on_estimation_complete() override { done = true; }
};

std::unique_ptr<time_alignment_estimator> make_ta_est_tail() {
  time_alignment_estimator_dft_impl::collection_dft_processors dfts;
  for (unsigned size = 128; size <= 8192; size *= 2) {
    dfts.emplace(size, std::make_unique<dft_processor_generic_impl>(
                           dft_processor::configuration{size, dft_processor::direction::INVERSE}));
  }
  return std::make_unique<time_alignment_estimator_dft_impl>(std::move(dfts));
}

void gen_dmrs_pusch() {
  start("dmrs_pusch");
  manifest m("manifest.json");
  auto rng = make_rng(0xD49C);
  std::normal_distribution<float> nd(0.f, 1.f);

  struct dcase {
    unsigned nof_prb, rb_start, layers, slot_idx, scrambling_id;
    bool n_scid;
    unsigned symbol_mask;  // DM-RS symbols
  };
  std::vector<dcase> cases = {
      {20, 0, 1, 0, 0, false, (1u << 2)},
      {20, 0, 1, 3, 17, true, (1u << 2) | (1u << 7) | (1u << 11)},
      {52, 0, 2, 1, 5, false, (1u << 2) | (1u << 11)},
      {52, 5, 1, 7, 101, false, (1u << 2) | (1u << 11)},
      {52, 0, 4, 2, 33, true, (1u << 2) | (1u << 11)},
      {24, 0, 2, 9, 7, true, (1u << 3) | (1u << 10)},
  };

  int idx = 0;
  for (const auto& c : cases) {
    unsigned nof_symbols = 14;
    unsigned grid_prbs = c.rb_start + c.nof_prb;
    unsigned nof_subc = grid_prbs * NRE;
    tail_grid grid(1, nof_symbols, nof_subc);
    std::vector<float> grid_dump;
    grid_dump.reserve(2 * nof_symbols * nof_subc);
    for (unsigned l = 0; l != nof_symbols; ++l) {
      for (unsigned k = 0; k != nof_subc; ++k) {
        cf_t v = cf_t(nd(rng), nd(rng)) * 0.7071f;
        grid.at(0, l, k) = v;
        cf_t q = to_cf(grid.at(0, l, k));  // record the cbf16-quantized value
        grid_dump.push_back(q.real());
        grid_dump.push_back(q.imag());
      }
    }

    auto port_est = std::make_unique<port_channel_estimator_average_impl>(
        std::make_unique<interpolator_linear_impl>(), make_ta_est_tail(),
        port_channel_estimator_fd_smoothing_strategy::filter,
        port_channel_estimator_td_interpolation_strategy::average,
        /*compensate_cfo=*/false);
    tail_executor exec;
    dmrs_pusch_estimator_impl est(
        std::make_unique<pseudo_random_generator_impl>(),
        std::make_unique<low_papr_sequence_generator_impl>(),
        std::move(port_est), exec);

    dmrs_pusch_estimator::configuration cfg;
    cfg.slot = slot_point(to_numerology_value(subcarrier_spacing::kHz30), c.slot_idx);
    dmrs_pusch_estimator::pseudo_random_sequence_configuration seq;
    seq.type = dmrs_type::TYPE1;
    seq.nof_tx_layers = c.layers;
    seq.scrambling_id = c.scrambling_id;
    seq.n_scid = c.n_scid;
    cfg.sequence_config = seq;
    cfg.scaling = convert_dB_to_amplitude(-get_sch_to_dmrs_ratio_dB(2));
    cfg.c_prefix = cyclic_prefix::NORMAL;
    cfg.symbols_mask = bounded_bitset<MAX_NSYMB_PER_SLOT>(nof_symbols);
    for (unsigned s = 0; s != nof_symbols; ++s)
      if (c.symbol_mask & (1u << s)) cfg.symbols_mask.set(s);
    cfg.rb_mask = crb_bitmap(grid_prbs);
    cfg.rb_mask.fill(c.rb_start, c.rb_start + c.nof_prb);
    cfg.first_symbol = 0;
    cfg.nof_symbols = nof_symbols;
    cfg.rx_ports = {0};

    channel_estimate::channel_estimate_dimensions dims;
    dims.nof_prb = grid_prbs;
    dims.nof_symbols = nof_symbols;
    dims.nof_rx_ports = 1;
    dims.nof_tx_layers = c.layers;
    channel_estimate estimate(dims);
    tail_notifier notifier;
    est.estimate(estimate, notifier, grid, cfg);

    // CE of symbol 0 per layer (td strategy "average" makes every symbol
    // identical) over the WHOLE grid band.
    std::vector<float> ce_dump;
    for (unsigned l = 0; l != c.layers; ++l) {
      span<const cbf16_t> ce = estimate.get_symbol_ch_estimate(0, 0, l);
      for (auto v : ce) {
        cf_t q = to_cf(v);
        ce_dump.push_back(q.real());
        ce_dump.push_back(q.imag());
      }
    }
    std::string base = std::to_string(idx);
    write_dat("grid" + base + ".dat", grid_dump);
    write_dat("ce" + base + ".dat", ce_dump);
    m.begin_case();
    m.field("nof_prb", (long long)c.nof_prb);
    m.field("rb_start", (long long)c.rb_start);
    m.field("grid_prbs", (long long)grid_prbs);
    m.field("layers", (long long)c.layers);
    m.field("slot_idx", (long long)c.slot_idx);
    m.field("scrambling_id", (long long)c.scrambling_id);
    m.field("n_scid", (long long)(c.n_scid ? 1 : 0));
    m.field("symbol_mask", (long long)c.symbol_mask);
    m.field("noise_var", (double)estimate.get_noise_variance(0));
    m.field("idx", (long long)idx);
    m.end_case();
    ++idx;
  }
  m.flush();
}

} // namespace

void gen_uci_decoder_suite() { gen_uci_decoder(); }
void gen_transform_precoder_suite() { gen_transform_precoder(); }
void gen_dmrs_pusch_suite() { gen_dmrs_pusch(); }
