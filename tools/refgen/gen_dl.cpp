// DL control/broadcast processor golden suites: the REFERENCE
// pdcch_processor (lib/phy/upper/channel_processors/pdcch/) and
// ssb_processor (lib/phy/upper/channel_processors/ssb/) produce full grid
// contributions from PDUs; tests/vectors/test_golden_dl_proc.py asserts
// our phy.pdcch / phy.ssb TX chains generate identical grids.

#include "common.h"

#include "lib/phy/generic_functions/precoding/channel_precoder_generic.h"
#include "lib/phy/support/resource_grid_mapper_impl.h"
#include "lib/phy/upper/channel_coding/crc_calculator_lut_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_allocator_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_code_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_encoder_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_interleaver_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_rate_matcher_impl.h"
#include "lib/phy/upper/channel_modulation/modulation_mapper_lut_impl.h"
#include "lib/phy/upper/channel_processors/pdcch/pdcch_encoder_impl.h"
#include "lib/phy/upper/channel_processors/pdcch/pdcch_modulator_impl.h"
#include "lib/phy/upper/channel_processors/pdcch/pdcch_processor_impl.h"
#include "lib/phy/upper/channel_processors/ssb/pbch_encoder_impl.h"
#include "lib/phy/upper/channel_processors/ssb/pbch_modulator_impl.h"
#include "lib/phy/upper/channel_processors/ssb/ssb_processor_impl.h"
#include "lib/phy/upper/sequence_generators/pseudo_random_generator_impl.h"
#include "lib/phy/upper/signal_processors/pdcch/dmrs_pdcch_processor_impl.h"
#include "lib/phy/upper/signal_processors/ssb/dmrs_pbch_processor_impl.h"
#include "lib/phy/upper/signal_processors/ssb/pss_processor_impl.h"
#include "lib/phy/upper/signal_processors/ssb/sss_processor_impl.h"
#include "lib/phy/upper/signal_processors/nzp_csi_rs/nzp_csi_rs_generator_impl.h"
#include "lib/phy/upper/signal_processors/prs/prs_generator_impl.h"
#include "lib/phy/upper/signal_processors/srs/srs_estimator_generic_impl.h"
#include "lib/phy/support/time_alignment_estimator/time_alignment_estimator_dft_impl.h"
#include "lib/phy/generic_functions/dft_processor_generic_impl.h"
#include "srsran/ran/srs/srs_information.h"
#include "srsran/phy/upper/signal_processors/srs/srs_estimator_configuration.h"
#include "srsran/phy/upper/signal_processors/srs/srs_estimator_result.h"
#include "lib/phy/upper/sequence_generators/low_papr_sequence_generator_impl.h"
#include "srsran/phy/upper/signal_processors/prs/prs_generator_configuration.h"
#include "srsran/phy/support/resource_grid_reader.h"
#include "srsran/phy/support/resource_grid_writer.h"
#include "srsran/ran/precoding/precoding_codebooks.h"

#include <random>

using namespace srsran;
using namespace refgen;

extern std::string g_root_outdir;

namespace {

void start(const std::string& name) { set_outdir(g_root_outdir + "/" + name); }

class dl_grid : public resource_grid_writer {
public:
  dl_grid(unsigned nof_ports, unsigned nof_symbols, unsigned nof_subc)
      : ports_(nof_ports), symbols_(nof_symbols), subc_(nof_subc),
        data_(nof_ports * nof_symbols * nof_subc, cbf16_t()) {}
  cbf16_t& at(unsigned p, unsigned l, unsigned k) {
    return data_[(p * symbols_ + l) * subc_ + k];
  }
  unsigned get_nof_ports() const override { return ports_; }
  unsigned get_nof_subc() const override { return subc_; }
  unsigned get_nof_symbols() const override { return symbols_; }
  span<const cf_t> put(unsigned port, unsigned l, unsigned k_init,
                       const bounded_bitset<MAX_RB* NRE>& mask,
                       span<const cf_t> symbols) override {
    unsigned i = 0;
    for (unsigned k = 0; k != mask.size(); ++k)
      if (mask.test(k)) at(port, l, k_init + k) = to_cbf16(symbols[i++]);
    return symbols.last(symbols.size() - i);
  }
  span<const cbf16_t> put(unsigned port, unsigned l, unsigned k_init,
                          const bounded_bitset<MAX_RB* NRE>& mask,
                          span<const cbf16_t> symbols) override {
    unsigned i = 0;
    for (unsigned k = 0; k != mask.size(); ++k)
      if (mask.test(k)) at(port, l, k_init + k) = symbols[i++];
    return symbols.last(symbols.size() - i);
  }
  void put(unsigned port, unsigned l, unsigned k_init, span<const cf_t> symbols) override {
    for (unsigned i = 0; i != symbols.size(); ++i) at(port, l, k_init + i) = to_cbf16(symbols[i]);
  }
  void put(unsigned port, unsigned l, unsigned k_init, unsigned stride,
           span<const cbf16_t> symbols) override {
    for (unsigned i = 0; i != symbols.size(); ++i) at(port, l, k_init + i * stride) = symbols[i];
  }
  span<cbf16_t> get_view(unsigned port, unsigned l) override {
    return span<cbf16_t>(&at(port, l, 0), subc_);
  }

  void dump(const std::string& name) const {
    std::vector<cf_t> out;
    out.reserve(data_.size());
    for (const auto& v : data_) out.push_back(to_cf(v));
    write_dat(name, reinterpret_cast<const float*>(out.data()), 2 * out.size());
  }

private:
  unsigned ports_, symbols_, subc_;
  std::vector<cbf16_t> data_;
};

// --- PDCCH processor suite -------------------------------------------------

void gen_pdcch_processor() {
  start("pdcch_processor");
  manifest m("manifest.json");
  auto rng = make_rng(0xDCC0);

  auto make_proc = [] {
    auto encoder = std::make_unique<pdcch_encoder_impl>(
        std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24C),
        std::make_unique<polar_interleaver_impl>(),
        std::make_unique<polar_allocator_impl>(),
        std::make_unique<polar_code_impl>(),
        std::make_unique<polar_encoder_impl>(),
        std::make_unique<polar_rate_matcher_impl>());
    auto modulator = std::make_unique<pdcch_modulator_impl>(
        std::make_unique<modulation_mapper_lut_impl>(),
        std::make_unique<pseudo_random_generator_impl>(),
        std::make_unique<resource_grid_mapper_impl>(
            std::make_unique<channel_precoder_generic>()));
    auto dmrs = std::make_unique<dmrs_pdcch_processor_impl>(
        std::make_unique<pseudo_random_generator_impl>(),
        std::make_unique<resource_grid_mapper_impl>(
            std::make_unique<channel_precoder_generic>()));
    return std::make_unique<pdcch_processor_impl>(
        std::move(encoder), std::move(modulator), std::move(dmrs));
  };

  struct pcase {
    unsigned bwp_rb, coreset_rb_start, coreset_rb_count, start_sym, duration;
    unsigned cce_index, aggregation_level, payload_bits;
    unsigned rnti, n_id, n_rnti, slot_idx;
    bool interleaved;
    unsigned reg_bundle, interleaver_rows, shift_index;
  };
  std::vector<pcase> cases = {
      {52, 0, 48, 0, 1, 0, 4, 40, 0x4601, 17, 0x4601, 1, false, 6, 2, 0},
      {52, 6, 24, 0, 2, 2, 2, 28, 0x1234, 500, 0, 3, false, 6, 2, 0},
      {106, 0, 48, 1, 1, 0, 8, 60, 0x17a1, 77, 0x17a1, 7, true, 6, 2, 77},
      {52, 0, 36, 0, 2, 0, 1, 20, 0xfff0, 42, 0, 0, true, 2, 6, 11},
  };

  int idx = 0;
  for (const auto& c : cases) {
    unsigned subc = c.bwp_rb * NRE;
    dl_grid grid(1, 14, subc);
    auto proc = make_proc();

    std::vector<uint8_t> payload(c.payload_bits);
    for (auto& b : payload) b = rng() & 1;

    pdcch_processor::pdu_t pdu;
    pdu.slot = slot_point(to_numerology_value(subcarrier_spacing::kHz30), c.slot_idx);
    pdu.cp = cyclic_prefix::NORMAL;
    pdu.coreset.bwp_size_rb = c.bwp_rb;
    pdu.coreset.bwp_start_rb = 0;
    pdu.coreset.start_symbol_index = c.start_sym;
    pdu.coreset.duration = c.duration;
    pdu.coreset.frequency_resources.resize(pdcch_constants::MAX_NOF_FREQ_RESOURCES);
    for (unsigned i = 0; i != c.coreset_rb_count / 6; ++i)
      pdu.coreset.frequency_resources.set(c.coreset_rb_start / 6 + i);
    pdu.coreset.cce_to_reg_mapping =
        c.interleaved ? pdcch_processor::cce_to_reg_mapping_type::INTERLEAVED
                      : pdcch_processor::cce_to_reg_mapping_type::NON_INTERLEAVED;
    pdu.coreset.reg_bundle_size = c.reg_bundle;
    pdu.coreset.interleaver_size = c.interleaver_rows;
    pdu.coreset.shift_index = c.shift_index;
    pdu.dci.rnti = c.rnti;
    pdu.dci.n_id_pdcch_dmrs = c.n_id;
    pdu.dci.n_id_pdcch_data = c.n_id;
    pdu.dci.n_rnti = c.n_rnti;
    pdu.dci.cce_index = c.cce_index;
    pdu.dci.aggregation_level = c.aggregation_level;
    pdu.dci.dmrs_power_offset_dB = 0.0f;
    pdu.dci.data_power_offset_dB = 0.0f;
    pdu.dci.payload.assign(payload.begin(), payload.end());
    pdu.dci.precoding = precoding_configuration::make_wideband(make_single_port());

    proc->process(grid, pdu);

    std::string base = std::to_string(idx);
    grid.dump("grid" + base + ".dat");
    write_dat("payload" + base + ".dat", payload);

    m.begin_case();
    m.field("idx", (long long)idx);
    m.field("bwp_rb", (long long)c.bwp_rb);
    m.field("coreset_rb_start", (long long)c.coreset_rb_start);
    m.field("coreset_rb_count", (long long)c.coreset_rb_count);
    m.field("start_sym", (long long)c.start_sym);
    m.field("duration", (long long)c.duration);
    m.field("cce_index", (long long)c.cce_index);
    m.field("aggregation_level", (long long)c.aggregation_level);
    m.field("payload_bits", (long long)c.payload_bits);
    m.field("rnti", (long long)c.rnti);
    m.field("n_id", (long long)c.n_id);
    m.field("n_rnti", (long long)c.n_rnti);
    m.field("slot_idx", (long long)c.slot_idx);
    m.field("interleaved", (long long)(c.interleaved ? 1 : 0));
    m.field("reg_bundle", (long long)c.reg_bundle);
    m.field("interleaver_rows", (long long)c.interleaver_rows);
    m.field("shift_index", (long long)c.shift_index);
    m.end_case();
    ++idx;
  }
  m.flush();
}

// --- SSB processor suite ---------------------------------------------------

void gen_ssb_processor() {
  start("ssb_processor");
  manifest m("manifest.json");
  auto rng = make_rng(0x55B0);

  auto make_proc = [] {
    ssb_processor_config cfg;
    cfg.encoder = std::make_unique<pbch_encoder_impl>(
        std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24C),
        std::make_unique<pseudo_random_generator_impl>(),
        std::make_unique<polar_interleaver_impl>(),
        std::make_unique<polar_allocator_impl>(),
        std::make_unique<polar_code_impl>(),
        std::make_unique<polar_encoder_impl>(),
        std::make_unique<polar_rate_matcher_impl>());
    cfg.modulator = std::make_unique<pbch_modulator_impl>(
        std::make_unique<modulation_mapper_lut_impl>(),
        std::make_unique<pseudo_random_generator_impl>());
    cfg.dmrs = std::make_unique<dmrs_pbch_processor_impl>(
        std::make_unique<pseudo_random_generator_impl>());
    cfg.pss = std::make_unique<pss_processor_impl>();
    cfg.sss = std::make_unique<sss_processor_impl>();
    return std::make_unique<ssb_processor_impl>(std::move(cfg));
  };

  struct scase {
    unsigned pci, ssb_idx, L_max, sfn, slot_in_frame;
    unsigned subcarrier_offset, offset_pointA;
    float beta_pss;
  };
  // slot_in_frame selects the half-frame (hrf = slot >= 10 for kHz30) and
  // must contain the SSB burst position for the case pattern; keep the
  // SSB in the slot's first half for simplicity (ssb_idx 0/1 -> slot 0,
  // 2/3 -> slot 1, ...).
  std::vector<scase> cases = {
      {42, 0, 8, 16, 0, 0, 0, 0.0f},
      {500, 3, 8, 109, 1, 2, 4, 0.0f},
      {911, 1, 4, 7, 0, 6, 2, 0.0f},
      {42, 5, 8, 16, 12, 0, 0, 0.0f},  // second half-frame (hrf = 1)
  };

  int idx = 0;
  for (const auto& c : cases) {
    // Grid: 20 PRB wide is plenty for offset_pointA + 20 RB SSB.
    unsigned subc = (c.offset_pointA + 24) * NRE;
    dl_grid grid(1, 14, subc);
    auto proc = make_proc();

    std::array<uint8_t, 24> mib;
    for (auto& b : mib) b = rng() & 1;

    ssb_processor::pdu_t pdu;
    pdu.slot = slot_point(to_numerology_value(subcarrier_spacing::kHz30),
                          (unsigned)c.sfn, c.slot_in_frame);
    pdu.phys_cell_id = c.pci;
    pdu.beta_pss = c.beta_pss;
    pdu.ssb_idx = c.ssb_idx;
    pdu.L_max = c.L_max;
    pdu.common_scs = subcarrier_spacing::kHz30;
    pdu.subcarrier_offset = c.subcarrier_offset;
    pdu.offset_to_pointA = c.offset_pointA;
    pdu.pattern_case = ssb_pattern_case::C;
    std::copy(mib.begin(), mib.end(), pdu.mib_payload.begin());
    pdu.ports.push_back(0);

    proc->process(grid, pdu);

    unsigned l_start_in_burst = ssb_get_l_first(pdu.pattern_case, pdu.ssb_idx);
    unsigned l_start = l_start_in_burst % 14;
    unsigned k_start = ssb_get_k_first(to_frequency_range(pdu.pattern_case),
                                       to_subcarrier_spacing(pdu.pattern_case),
                                       pdu.common_scs, pdu.offset_to_pointA,
                                       pdu.subcarrier_offset);

    std::string base = std::to_string(idx);
    grid.dump("grid" + base + ".dat");
    write_dat("mib" + base + ".dat", std::vector<uint8_t>(mib.begin(), mib.end()));

    m.begin_case();
    m.field("idx", (long long)idx);
    m.field("pci", (long long)c.pci);
    m.field("ssb_idx", (long long)c.ssb_idx);
    m.field("L_max", (long long)c.L_max);
    m.field("sfn", (long long)c.sfn);
    m.field("slot_in_frame", (long long)c.slot_in_frame);
    m.field("subcarrier_offset", (long long)c.subcarrier_offset);
    m.field("offset_pointA", (long long)c.offset_pointA);
    m.field("grid_rb", (long long)(c.offset_pointA + 24));
    m.field("l_start", (long long)l_start);
    m.field("k_start", (long long)k_start);
    m.field("hrf", (long long)(pdu.slot.is_odd_hrf() ? 1 : 0));
    m.end_case();
    ++idx;
  }
  m.flush();
}

// --- NZP-CSI-RS generator suite --------------------------------------------

void gen_csi_rs_generator() {
  start("csi_rs_generator");
  manifest m("manifest.json");

  auto make_gen = [] {
    return std::make_unique<nzp_csi_rs_generator_impl>(
        std::make_unique<pseudo_random_generator_impl>(),
        std::make_unique<resource_grid_mapper_impl>(
            std::make_unique<channel_precoder_generic>()));
  };

  struct ccase {
    unsigned row, rb_start, rb_count, l0, l1;
    std::vector<unsigned> k_ref;     // freq_allocation_ref_idx values
    csi_rs_cdm_type cdm;
    csi_rs_freq_density_type density;
    unsigned scrambling_id, slot_idx;
    unsigned nof_ports;
    std::vector<unsigned> ki;        // our-framework k-bar list
  };
  std::vector<ccase> cases = {
      {1, 0, 16, 5, 0, {2}, csi_rs_cdm_type::no_CDM,
       csi_rs_freq_density_type::three, 42, 3, 1, {2}},
      {2, 4, 24, 13, 0, {7}, csi_rs_cdm_type::no_CDM,
       csi_rs_freq_density_type::one, 500, 7, 1, {7}},
      {4, 0, 12, 9, 0, {4}, csi_rs_cdm_type::fd_CDM2,
       csi_rs_freq_density_type::one, 77, 1, 4, {4, 6}},
      {5, 2, 10, 5, 0, {6}, csi_rs_cdm_type::fd_CDM2,
       csi_rs_freq_density_type::one, 901, 8, 4, {6}},
      {5, 6, 18, 9, 0, {2}, csi_rs_cdm_type::fd_CDM2,
       csi_rs_freq_density_type::one, 10, 2, 4, {2}},
  };

  int idx = 0;
  for (const auto& c : cases) {
    unsigned bwp_rb = c.rb_start + c.rb_count;
    unsigned subc = bwp_rb * NRE;
    dl_grid grid(c.nof_ports, 14, subc);
    auto gen = make_gen();

    nzp_csi_rs_generator::config_t cfg;
    cfg.slot = slot_point(to_numerology_value(subcarrier_spacing::kHz30), c.slot_idx);
    cfg.cp = cyclic_prefix::NORMAL;
    cfg.start_rb = c.rb_start;
    cfg.nof_rb = c.rb_count;
    cfg.csi_rs_mapping_table_row = c.row;
    for (unsigned v : c.k_ref) cfg.freq_allocation_ref_idx.push_back(v);
    cfg.symbol_l0 = c.l0;
    cfg.symbol_l1 = c.l1;
    cfg.cdm = c.cdm;
    cfg.freq_density = c.density;
    cfg.scrambling_id = c.scrambling_id;
    cfg.amplitude = 1.0f;
    cfg.precoding = precoding_configuration::make_wideband(make_identity(c.nof_ports));

    gen->map(grid, cfg);

    std::string base = std::to_string(idx);
    grid.dump("grid" + base + ".dat");

    m.begin_case();
    m.field("idx", (long long)idx);
    m.field("row", (long long)c.row);
    m.field("rb_start", (long long)c.rb_start);
    m.field("rb_count", (long long)c.rb_count);
    m.field("l0", (long long)c.l0);
    m.field("l1", (long long)c.l1);
    m.field("scrambling_id", (long long)c.scrambling_id);
    m.field("slot_idx", (long long)c.slot_idx);
    m.field("nof_ports", (long long)c.nof_ports);
    m.field("bwp_rb", (long long)bwp_rb);
    {
      std::string s = "[";
      for (size_t i = 0; i != c.ki.size(); ++i)
        s += (i ? "," : "") + std::to_string(c.ki[i]);
      s += "]";
      m.raw_field("ki", s);
    }
    m.end_case();
    ++idx;
  }
  m.flush();
}

// --- PRS generator suite ---------------------------------------------------

void gen_prs_generator() {
  start("prs_generator");
  manifest m("manifest.json");

  struct pcase {
    unsigned rb_start, rb_count, start_symbol, nof_symbols;
    unsigned comb_size, comb_offset, n_id_prs, slot_idx;
  };
  std::vector<pcase> cases = {
      {0, 24, 2, 4, 4, 0, 17, 1},
      {4, 48, 0, 12, 4, 2, 2025, 5},
      {0, 24, 3, 6, 6, 1, 4000, 9},
      {8, 24, 0, 2, 2, 0, 511, 0},
      {0, 48, 1, 12, 12, 7, 1234, 2},
  };

  int idx = 0;
  for (const auto& c : cases) {
    unsigned bwp_rb = c.rb_start + c.rb_count;
    unsigned subc = bwp_rb * NRE;
    dl_grid grid(1, 14, subc);
    prs_generator_impl gen(std::make_unique<pseudo_random_generator_impl>(),
                           std::make_unique<channel_precoder_generic>());

    prs_generator_configuration cfg;
    cfg.slot = slot_point(to_numerology_value(subcarrier_spacing::kHz30), c.slot_idx);
    cfg.cp = cyclic_prefix::NORMAL;
    cfg.n_id_prs = c.n_id_prs;
    cfg.comb_size = static_cast<prs_comb_size>(c.comb_size);
    cfg.comb_offset = c.comb_offset;
    cfg.duration = static_cast<prs_num_symbols>(c.nof_symbols);
    cfg.start_symbol = c.start_symbol;
    cfg.prb_start = c.rb_start;
    cfg.freq_alloc = {c.rb_start, c.rb_start + c.rb_count};
    cfg.power_offset_dB = 0.0f;
    cfg.precoding = precoding_configuration::make_wideband(make_single_port());

    gen.generate(grid, cfg);

    std::string base = std::to_string(idx);
    grid.dump("grid" + base + ".dat");

    m.begin_case();
    m.field("idx", (long long)idx);
    m.field("rb_start", (long long)c.rb_start);
    m.field("rb_count", (long long)c.rb_count);
    m.field("start_symbol", (long long)c.start_symbol);
    m.field("nof_symbols", (long long)c.nof_symbols);
    m.field("comb_size", (long long)c.comb_size);
    m.field("comb_offset", (long long)c.comb_offset);
    m.field("n_id_prs", (long long)c.n_id_prs);
    m.field("slot_idx", (long long)c.slot_idx);
    m.field("bwp_rb", (long long)bwp_rb);
    m.end_case();
    ++idx;
  }
  m.flush();
}

// --- SRS estimator suite ---------------------------------------------------

// Reader view over dl_grid (the SRS estimator consumes a reader).
class srs_reader_grid : public resource_grid_reader {
public:
  srs_reader_grid(const dl_grid& g, unsigned ports, unsigned symbols, unsigned subc)
      : g_(g), ports_(ports), symbols_(symbols), subc_(subc) {}
  unsigned get_nof_ports() const override { return ports_; }
  unsigned get_nof_subc() const override { return subc_; }
  unsigned get_nof_symbols() const override { return symbols_; }
  bool is_empty(unsigned) const override { return false; }
  bool is_empty() const override { return false; }
  span<cf_t> get(span<cf_t> symbols, unsigned port, unsigned l, unsigned k_init,
                 const bounded_bitset<MAX_RB * NRE>& mask) const override {
    unsigned i = 0;
    for (unsigned k = 0; k != mask.size(); ++k)
      if (mask.test(k)) symbols[i++] = to_cf(const_cast<dl_grid&>(g_).at(port, l, k_init + k));
    return symbols.last(symbols.size() - i);
  }
  span<cbf16_t> get(span<cbf16_t> symbols, unsigned port, unsigned l, unsigned k_init,
                    const bounded_bitset<MAX_RB * NRE>& mask) const override {
    unsigned i = 0;
    for (unsigned k = 0; k != mask.size(); ++k)
      if (mask.test(k)) symbols[i++] = const_cast<dl_grid&>(g_).at(port, l, k_init + k);
    return symbols.last(symbols.size() - i);
  }
  void get(span<cf_t> symbols, unsigned port, unsigned l, unsigned k_init,
           unsigned stride) const override {
    for (unsigned i = 0; i != symbols.size(); ++i)
      symbols[i] = to_cf(const_cast<dl_grid&>(g_).at(port, l, k_init + i * stride));
  }
  void get(span<cbf16_t> symbols, unsigned port, unsigned l, unsigned k_init) const override {
    for (unsigned i = 0; i != symbols.size(); ++i)
      symbols[i] = const_cast<dl_grid&>(g_).at(port, l, k_init + i);
  }
  span<const cbf16_t> get_view(unsigned port, unsigned l) const override {
    return const_cast<dl_grid&>(g_).get_view(port, l);
  }

private:
  const dl_grid& g_;
  unsigned ports_, symbols_, subc_;
};

void gen_srs_estimator() {
  start("srs_estimator");
  manifest m("manifest.json");
  auto rng = make_rng(0x5125);
  std::normal_distribution<float> noise_d(0.f, 1.f);

  struct scase {
    unsigned c_srs, b_srs, comb, comb_offset, cyclic_shift;
    unsigned freq_shift, start_symbol, nof_symbols;
    unsigned sequence_id, slot_idx, rx_ports;
    float snr_db;
    unsigned tx_ports = 1;
  };
  std::vector<scase> cases = {
      {0, 0, 2, 0, 0, 0, 13, 1, 17, 1, 1, 25.f},
      {5, 0, 2, 1, 3, 2, 12, 2, 500, 5, 2, 25.f},
      {12, 0, 4, 2, 5, 1, 10, 4, 77, 8, 1, 25.f},
      {20, 0, 4, 0, 11, 4, 13, 1, 901, 3, 2, 28.f},
      // Multi-antenna-port SRS: 2 ports (shared comb, split shifts) and
      // 4 ports with cs >= n_cs_max/2 (ports 1/3 interleave combs).
      {12, 0, 2, 0, 1, 0, 12, 2, 333, 2, 1, 28.f, 2},
      {12, 0, 4, 1, 7, 2, 10, 4, 555, 6, 2, 28.f, 4},
  };

  int idx = 0;
  for (const auto& c : cases) {
    srs_resource_configuration res;
    res.nof_antenna_ports =
        static_cast<srs_resource_configuration::one_two_four_enum>(c.tx_ports);
    res.nof_symbols = static_cast<srs_resource_configuration::one_two_four_enum>(c.nof_symbols);
    res.start_symbol = c.start_symbol;
    res.configuration_index = c.c_srs;
    res.sequence_id = c.sequence_id;
    res.bandwidth_index = c.b_srs;
    res.comb_size = static_cast<srs_resource_configuration::comb_size_enum>(c.comb);
    res.comb_offset = c.comb_offset;
    res.cyclic_shift = c.cyclic_shift;
    res.freq_position = 0;
    res.freq_shift = c.freq_shift;
    res.freq_hopping = 0;
    res.hopping = srs_resource_configuration::group_or_sequence_hopping_enum::neither;
    res.periodicity = std::nullopt;

    srs_information info = get_srs_information(res, 0);
    unsigned m_sc = info.sequence_length;
    unsigned k0 = info.mapping_initial_subcarrier;
    unsigned bwp_rb = (k0 + m_sc * c.comb + NRE - 1) / NRE + 2;
    unsigned subc = bwp_rb * NRE;

    // Synthesize the SRS transmission with the reference sequence
    // primitives over per-(rx,tx) phase-offset channels with one common
    // delay ramp + noise.
    low_papr_sequence_generator_impl seq_gen;

    dl_grid grid(c.rx_ports, 14, subc);
    float nstd = std::sqrt(std::pow(10.f, -c.snr_db / 10.f) / 2.f);
    for (unsigned p = 0; p != c.rx_ports; ++p)
      for (unsigned s = 0; s != 14; ++s)
        for (unsigned k = 0; k != subc; ++k)
          grid.at(p, s, k) = to_cbf16(nstd * cf_t(noise_d(rng), noise_d(rng)));
    for (unsigned tx = 0; tx != c.tx_ports; ++tx) {
      srs_information tx_info = get_srs_information(res, tx);
      std::vector<cf_t> seq(m_sc);
      seq_gen.generate(seq, tx_info.sequence_group, tx_info.sequence_number,
                       tx_info.n_cs, tx_info.n_cs_max);
      for (unsigned p = 0; p != c.rx_ports; ++p) {
        for (unsigned s = 0; s != c.nof_symbols; ++s) {
          unsigned sym = c.start_symbol + s;
          for (unsigned i = 0; i != m_sc; ++i) {
            unsigned k = tx_info.mapping_initial_subcarrier + i * c.comb;
            // Same delay (frequency ramp) on every path — the reference's
            // TA estimate is a joint peak; per-(rx,tx) constant phases
            // keep the channel coefficients distinct.
            float ph = 2.f * (float)M_PI *
                       (0.03f * i / (float)m_sc + 0.11f * p + 0.07f * tx);
            cf_t h = cf_t(std::cos(ph), std::sin(ph));
            cf_t cur = to_cf(grid.at(p, sym, k));
            grid.at(p, sym, k) = to_cbf16(cur + seq[i] * h);
          }
        }
      }
    }

    // Reference estimator.
    srs_estimator_generic_impl::dependencies deps;
    deps.sequence_generator = std::make_unique<low_papr_sequence_generator_impl>();
    {
      time_alignment_estimator_dft_impl::collection_dft_processors dfts;
      for (unsigned size = 128; size <= 8192; size *= 2) {
        dfts.emplace(size, std::make_unique<dft_processor_generic_impl>(
                               dft_processor::configuration{
                                   size, dft_processor::direction::INVERSE}));
      }
      deps.ta_estimator =
          std::make_unique<time_alignment_estimator_dft_impl>(std::move(dfts));
    }
    srs_estimator_generic_impl estimator(std::move(deps), MAX_RB);

    srs_estimator_configuration cfg;
    cfg.slot = slot_point(to_numerology_value(subcarrier_spacing::kHz30), c.slot_idx);
    cfg.resource = res;
    for (unsigned p = 0; p != c.rx_ports; ++p) cfg.ports.push_back(p);

    srs_reader_grid reader(grid, c.rx_ports, 14, subc);
    srs_estimator_result result = estimator.estimate(reader, cfg);

    std::string base = std::to_string(idx);
    grid.dump("grid" + base + ".dat");
    std::vector<cf_t> h_ref;
    for (unsigned p = 0; p != c.rx_ports; ++p)
      for (unsigned tx = 0; tx != c.tx_ports; ++tx)
        h_ref.push_back(result.channel_matrix.get_coefficient(p, tx));
    write_dat("h" + base + ".dat", reinterpret_cast<const float*>(h_ref.data()),
              2 * h_ref.size());

    m.begin_case();
    m.field("idx", (long long)idx);
    m.field("m_sc", (long long)m_sc);
    m.field("k0", (long long)k0);
    m.field("comb", (long long)c.comb);
    m.field("n_cs", (long long)info.n_cs);
    m.field("n_cs_max", (long long)info.n_cs_max);
    m.field("u", (long long)info.sequence_group);
    m.field("sequence_id", (long long)c.sequence_id);
    m.field("cyclic_shift", (long long)c.cyclic_shift);
    m.field("start_symbol", (long long)c.start_symbol);
    m.field("nof_symbols", (long long)c.nof_symbols);
    m.field("rx_ports", (long long)c.rx_ports);
    m.field("tx_ports", (long long)c.tx_ports);
    m.field("bwp_rb", (long long)bwp_rb);
    m.field("ref_ta_s", result.time_alignment.time_alignment);
    m.field("ref_epre_db", (double)result.epre_dB.value_or(-999.0));
    m.field("ref_noise_var", (double)result.noise_variance.value_or(-1.0));
    m.end_case();
    ++idx;
  }
  m.flush();
}

} // namespace

void gen_pdcch_processor_suite() { gen_pdcch_processor(); }
void gen_ssb_processor_suite() { gen_ssb_processor(); }
void gen_csi_rs_generator_suite() { gen_csi_rs_generator(); }
void gen_prs_generator_suite() { gen_prs_generator(); }
void gen_srs_estimator_suite() { gen_srs_estimator(); }
