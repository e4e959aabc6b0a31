// Golden generators for PHY numeric blocks: generic DFT, OFDM
// modulator/demodulator (incl. TS38.211 §5.4 phase compensation and the
// intra-CP DFT window offset), MIMO equalizer (ZF/MMSE), and the PRACH
// frequency-domain sequence generator.

#include "common.h"

#include "lib/phy/generic_functions/dft_processor_generic_impl.h"
#include "lib/phy/lower/modulation/ofdm_demodulator_impl.h"
#include "lib/phy/lower/modulation/ofdm_modulator_impl.h"
#include "lib/phy/upper/channel_processors/prach_generator_impl.h"
#include "lib/phy/upper/equalization/channel_equalizer_generic_impl.h"
#include "srsran/phy/support/resource_grid_reader.h"
#include "srsran/phy/support/resource_grid_writer.h"

#include <cmath>
#include <cstring>

using namespace srsran;
using namespace refgen;

extern std::string g_root_outdir;

namespace {

void start(const std::string& name) { set_outdir(g_root_outdir + "/" + name); }

// A dense (port, symbol, subcarrier) grid backing both grid interfaces —
// refgen-local stand-in for the reference's resource_grid_impl.
class dense_grid : public resource_grid_reader, public resource_grid_writer {
public:
  dense_grid(unsigned nof_ports, unsigned nof_symbols, unsigned nof_subc)
      : ports_(nof_ports), symbols_(nof_symbols), subc_(nof_subc),
        data_(nof_ports * nof_symbols * nof_subc, cbf16_t()) {}

  cbf16_t& at(unsigned p, unsigned l, unsigned k) {
    if (p >= ports_ || l >= symbols_ || k >= subc_) {
      ::fprintf(stderr, "dense_grid OOB put p=%u l=%u k=%u (ports=%u sym=%u subc=%u)\n", p, l, k, ports_, symbols_, subc_);
      ::abort();
    }
    return data_[(p * symbols_ + l) * subc_ + k];
  }
  const cbf16_t& at(unsigned p, unsigned l, unsigned k) const {
    if (p >= ports_ || l >= symbols_ || k >= subc_) {
      ::fprintf(stderr, "dense_grid OOB get p=%u l=%u k=%u (ports=%u sym=%u subc=%u)\n", p, l, k, ports_, symbols_, subc_);
      ::abort();
    }
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
    for (unsigned k = 0; k != mask.size(); ++k) {
      if (mask.test(k)) symbols[i++] = to_cf(at(port, l, k_init + k));
    }
    return symbols.last(symbols.size() - i);
  }
  span<cbf16_t> get(span<cbf16_t> symbols, unsigned port, unsigned l, unsigned k_init,
                    const bounded_bitset<MAX_RB * NRE>& mask) const override {
    unsigned i = 0;
    for (unsigned k = 0; k != mask.size(); ++k) {
      if (mask.test(k)) symbols[i++] = at(port, l, k_init + k);
    }
    return symbols.last(symbols.size() - i);
  }
  void get(span<cf_t> symbols, unsigned port, unsigned l, unsigned k_init,
           unsigned stride) const override {
    for (unsigned i = 0; i != symbols.size(); ++i) {
      symbols[i] = to_cf(at(port, l, k_init + i * stride));
    }
  }
  void get(span<cbf16_t> symbols, unsigned port, unsigned l, unsigned k_init) const override {
    for (unsigned i = 0; i != symbols.size(); ++i) symbols[i] = at(port, l, k_init + i);
  }
  span<const cbf16_t> get_view(unsigned port, unsigned l) const override {
    return span<const cbf16_t>(&at(port, l, 0), subc_);
  }

  span<const cf_t> put(unsigned port, unsigned l, unsigned k_init,
                       const bounded_bitset<MAX_RB* NRE>& mask,
                       span<const cf_t> symbols) override {
    unsigned i = 0;
    for (unsigned k = 0; k != mask.size(); ++k) {
      if (mask.test(k)) at(port, l, k_init + k) = to_cbf16(symbols[i++]);
    }
    return symbols.last(symbols.size() - i);
  }
  span<const cbf16_t> put(unsigned port, unsigned l, unsigned k_init,
                          const bounded_bitset<MAX_RB* NRE>& mask,
                          span<const cbf16_t> symbols) override {
    unsigned i = 0;
    for (unsigned k = 0; k != mask.size(); ++k) {
      if (mask.test(k)) at(port, l, k_init + k) = symbols[i++];
    }
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

private:
  unsigned ports_, symbols_, subc_;
  std::vector<cbf16_t> data_;
};

std::vector<cf_t> random_iq(std::mt19937& rng, size_t n, float scale = 1.f) {
  std::normal_distribution<float> d(0.f, scale);
  std::vector<cf_t> out(n);
  for (auto& v : out) v = cf_t(d(rng), d(rng));
  return out;
}

// ------------------------------------------------------------------ dft ----

void gen_dft() {
  start("dft");
  manifest m("manifest.json");
  auto rng = make_rng(0xDF7);
  int idx = 0;
  for (unsigned size : {128u, 139u, 256u, 512u, 839u, 1024u, 2048u, 3072u, 4096u}) {
    for (auto dir : {dft_processor::direction::DIRECT, dft_processor::direction::INVERSE}) {
      dft_processor::configuration cfg{size, dir};
      dft_processor_generic_impl dft(cfg);
      if (!dft.is_valid()) continue;
      auto in = random_iq(rng, size);
      std::copy(in.begin(), in.end(), dft.get_input().begin());
      span<const cf_t> out = dft.run();
      std::string fi = "in" + std::to_string(idx) + ".dat";
      std::string fo = "out" + std::to_string(idx) + ".dat";
      write_dat(fi, reinterpret_cast<const float*>(in.data()), 2 * size);
      write_dat(fo, reinterpret_cast<const float*>(out.data()), 2 * size);
      m.begin_case();
      m.field("size", (long long)size);
      m.field("dir", std::string(dir == dft_processor::direction::DIRECT ? "direct" : "inverse"));
      m.field("input", fi);
      m.field("output", fo);
      m.end_case();
      ++idx;
    }
  }
  m.flush();
}

// --------------------------------------------------------------- ofdm ----

void gen_ofdm_modulator() {
  start("ofdm_modulator");
  manifest m("manifest.json");
  auto rng = make_rng(0x0FD1);
  struct ocase { unsigned numerology, bw_rb, dft_size; double cfreq; };
  std::vector<ocase> cases = {
      {0, 52, 1024, 0.0},
      {0, 106, 2048, 3.5e9},
      {1, 51, 1024, 3.5e9},
      {1, 106, 2048, 0.0},
      {1, 273, 4096, 3.9e9},
      {2, 24, 512, 26e9},
  };
  int idx = 0;
  for (const auto& c : cases) {
    ofdm_modulator_configuration cfg;
    cfg.numerology = c.numerology;
    cfg.bw_rb = c.bw_rb;
    cfg.dft_size = c.dft_size;
    cfg.cp = cyclic_prefix::NORMAL;
    cfg.scale = 1.0f;
    cfg.center_freq_Hz = c.cfreq;
    ofdm_modulator_common_configuration common;
    common.dft = std::make_unique<dft_processor_generic_impl>(
        dft_processor::configuration{c.dft_size, dft_processor::direction::INVERSE});
    ofdm_symbol_modulator_impl mod(common, cfg);

    unsigned nof_symbols = get_nsymb_per_slot(cyclic_prefix::NORMAL);
    unsigned nof_subc = c.bw_rb * NRE;
    dense_grid grid(1, nof_symbols, nof_subc);
    std::vector<cf_t> grid_data;
    {
      auto iq = random_iq(rng, nof_symbols * nof_subc, (float)M_SQRT1_2);
      for (unsigned l = 0; l != nof_symbols; ++l)
        for (unsigned k = 0; k != nof_subc; ++k)
          grid.at(0, l, k) = to_cbf16(iq[l * nof_subc + k]);
      // Dump the grid as the bf16-rounded values the modulator actually reads.
      for (unsigned l = 0; l != nof_symbols; ++l)
        for (unsigned k = 0; k != nof_subc; ++k)
          grid_data.push_back(to_cf(grid.at(0, l, k)));
    }
    std::string fg = "grid" + std::to_string(idx) + ".dat";
    write_dat(fg, reinterpret_cast<const float*>(grid_data.data()), 2 * grid_data.size());

    // Modulate a full subframe of symbol indices (the phase-compensation
    // LUT covers one subframe) to cover both CP lengths and all phases.
    unsigned nof_mod_symbols = nof_symbols << c.numerology;
    std::vector<cf_t> all_out;
    std::vector<unsigned> sym_sizes;
    for (unsigned symbol = 0; symbol != nof_mod_symbols; ++symbol) {
      unsigned sym_size = mod.get_symbol_size(symbol);
      std::vector<cf_t> out(sym_size);
      mod.modulate(out, grid, 0, symbol);
      all_out.insert(all_out.end(), out.begin(), out.end());
      sym_sizes.push_back(sym_size);
    }
    std::string fo = "out" + std::to_string(idx) + ".dat";
    write_dat(fo, reinterpret_cast<const float*>(all_out.data()), 2 * all_out.size());
    std::string fs = "symsizes" + std::to_string(idx) + ".dat";
    std::vector<uint32_t> ss(sym_sizes.begin(), sym_sizes.end());
    write_dat(fs, ss);
    m.begin_case();
    m.field("numerology", (long long)c.numerology);
    m.field("bw_rb", (long long)c.bw_rb);
    m.field("dft_size", (long long)c.dft_size);
    m.field("center_freq_hz", (double)c.cfreq);
    m.field("nof_symbols", (long long)nof_mod_symbols);
    m.field("grid", fg);
    m.field("output", fo);
    m.field("symsizes", fs);
    m.end_case();
    ++idx;
  }
  m.flush();
}

void gen_ofdm_demodulator() {
  start("ofdm_demodulator");
  manifest m("manifest.json");
  auto rng = make_rng(0x0FD2);
  struct dcase { unsigned numerology, bw_rb, dft_size, window; double cfreq; };
  std::vector<dcase> cases = {
      {0, 52, 1024, 0, 0.0},
      {0, 106, 2048, 16, 3.5e9},
      {1, 106, 2048, 0, 3.5e9},
      {1, 273, 4096, 32, 3.9e9},
      {2, 24, 512, 8, 26e9},
  };
  int idx = 0;
  for (const auto& c : cases) {
    ofdm_demodulator_configuration cfg;
    cfg.numerology = c.numerology;
    cfg.bw_rb = c.bw_rb;
    cfg.dft_size = c.dft_size;
    cfg.cp = cyclic_prefix::NORMAL;
    cfg.nof_samples_window_offset = c.window;
    cfg.scale = 1.0f;
    cfg.center_freq_Hz = c.cfreq;
    ofdm_demodulator_common_configuration common;
    common.dft = std::make_unique<dft_processor_generic_impl>(
        dft_processor::configuration{c.dft_size, dft_processor::direction::DIRECT});
    ofdm_symbol_demodulator_impl demod(common, cfg);

    unsigned nof_symbols = get_nsymb_per_slot(cyclic_prefix::NORMAL);
    unsigned nof_subc = c.bw_rb * NRE;
    dense_grid grid(1, nof_symbols, nof_subc);

    std::vector<cf_t> all_in;
    std::vector<uint32_t> sym_sizes;
    for (unsigned symbol = 0; symbol != nof_symbols; ++symbol) {
      unsigned sym_size = demod.get_symbol_size(symbol);
      auto in = random_iq(rng, sym_size, 0.3f);
      demod.demodulate(grid, in, 0, symbol);
      all_in.insert(all_in.end(), in.begin(), in.end());
      sym_sizes.push_back(sym_size);
    }
    std::vector<cf_t> grid_out;
    for (unsigned l = 0; l != nof_symbols; ++l)
      for (unsigned k = 0; k != nof_subc; ++k) grid_out.push_back(to_cf(grid.at(0, l, k)));

    std::string fi = "in" + std::to_string(idx) + ".dat";
    write_dat(fi, reinterpret_cast<const float*>(all_in.data()), 2 * all_in.size());
    std::string fo = "grid" + std::to_string(idx) + ".dat";
    write_dat(fo, reinterpret_cast<const float*>(grid_out.data()), 2 * grid_out.size());
    std::string fs = "symsizes" + std::to_string(idx) + ".dat";
    write_dat(fs, sym_sizes);
    m.begin_case();
    m.field("numerology", (long long)c.numerology);
    m.field("bw_rb", (long long)c.bw_rb);
    m.field("dft_size", (long long)c.dft_size);
    m.field("window_offset", (long long)c.window);
    m.field("center_freq_hz", (double)c.cfreq);
    m.field("nof_symbols", (long long)nof_symbols);
    m.field("input", fi);
    m.field("grid", fo);
    m.field("symsizes", fs);
    m.end_case();
    ++idx;
  }
  m.flush();
}

// ------------------------------------------------------------ equalizer ----

class est_list : public channel_equalizer::ch_est_list {
public:
  est_list(unsigned nof_re, unsigned nof_ports, unsigned nof_layers)
      : nof_re_(nof_re), ports_(nof_ports), layers_(nof_layers),
        data_(nof_re * nof_ports * nof_layers) {}
  cbf16_t& at(unsigned re, unsigned port, unsigned layer) {
    return data_[(port * layers_ + layer) * nof_re_ + re];
  }
  span<const cbf16_t> get_channel(unsigned i_rx_port, unsigned i_layer) const override {
    return span<const cbf16_t>(&data_[(i_rx_port * layers_ + i_layer) * nof_re_], nof_re_);
  }
  unsigned get_nof_re() const override { return nof_re_; }
  unsigned get_nof_rx_ports() const override { return ports_; }
  unsigned get_nof_tx_layers() const override { return layers_; }

private:
  unsigned nof_re_, ports_, layers_;
  std::vector<cbf16_t> data_;
};

class re_buf : public re_buffer_reader<cbf16_t> {
public:
  re_buf(unsigned nof_slices, unsigned nof_re) : slices_(nof_slices), nof_re_(nof_re),
      data_(nof_slices * nof_re) {}
  cbf16_t& at(unsigned s, unsigned re) { return data_[s * nof_re_ + re]; }
  unsigned get_nof_slices() const override { return slices_; }
  unsigned get_nof_re() const override { return nof_re_; }
  span<const cbf16_t> get_slice(unsigned i) const override {
    return span<const cbf16_t>(&data_[i * nof_re_], nof_re_);
  }

private:
  unsigned slices_, nof_re_;
  std::vector<cbf16_t> data_;
};

void gen_equalizer() {
  start("equalizer");
  manifest m("manifest.json");
  auto rng = make_rng(0xE01A);
  const std::pair<channel_equalizer_algorithm_type, const char*> algs[] = {
      {channel_equalizer_algorithm_type::zf, "zf"},
      {channel_equalizer_algorithm_type::mmse, "mmse"},
  };
  std::normal_distribution<float> noise_d(0.f, 1.f);
  std::uniform_real_distribution<float> nv_d(0.01f, 0.5f);
  int idx = 0;
  for (auto [alg, alg_name] : algs) {
    channel_equalizer_generic_impl eq(alg);
    for (unsigned layers : {1u, 2u, 3u, 4u}) {
      for (unsigned ports : {1u, 2u, 4u}) {
        if (!eq.is_supported(ports, layers)) continue;
        const unsigned nof_re = 1200;
        re_buf symbols(ports, nof_re);
        est_list estimates(nof_re, ports, layers);
        std::vector<float> noise_vars(ports);
        for (auto& nv : noise_vars) nv = nv_d(rng);
        std::vector<cf_t> sym_dump, est_dump;
        for (unsigned p = 0; p != ports; ++p) {
          for (unsigned re = 0; re != nof_re; ++re) {
            cf_t v(noise_d(rng), noise_d(rng));
            symbols.at(p, re) = to_cbf16(v);
            sym_dump.push_back(to_cf(symbols.at(p, re)));
          }
          for (unsigned l = 0; l != layers; ++l) {
            for (unsigned re = 0; re != nof_re; ++re) {
              cf_t h = cf_t(noise_d(rng), noise_d(rng)) * (float)M_SQRT1_2;
              estimates.at(re, p, l) = to_cbf16(h);
            }
          }
        }
        for (unsigned p = 0; p != ports; ++p)
          for (unsigned l = 0; l != layers; ++l)
            for (unsigned re = 0; re != nof_re; ++re)
              est_dump.push_back(to_cf(estimates.at(re, p, l)));

        const float tx_scaling = 1.0f;
        std::vector<cf_t> eq_symbols(nof_re * layers);
        std::vector<float> eq_noise_vars(nof_re * layers);
        eq.equalize(eq_symbols, eq_noise_vars, symbols, estimates, noise_vars, tx_scaling);

        std::string base = std::to_string(idx);
        write_dat("syms" + base + ".dat", reinterpret_cast<const float*>(sym_dump.data()),
                  2 * sym_dump.size());
        write_dat("est" + base + ".dat", reinterpret_cast<const float*>(est_dump.data()),
                  2 * est_dump.size());
        write_dat("nvar" + base + ".dat", noise_vars);
        write_dat("eq" + base + ".dat", reinterpret_cast<const float*>(eq_symbols.data()),
                  2 * eq_symbols.size());
        write_dat("eqnvar" + base + ".dat", eq_noise_vars);
        m.begin_case();
        m.field("alg", std::string(alg_name));
        m.field("layers", (long long)layers);
        m.field("ports", (long long)ports);
        m.field("nof_re", (long long)nof_re);
        m.field("idx", (long long)idx);
        m.end_case();
        ++idx;
      }
    }
  }
  m.flush();
}

// ----------------------------------------------------------------- prach ----

void gen_prach_generator() {
  start("prach_generator");
  manifest m("manifest.json");
  prach_generator_impl gen;
  struct pcase { prach_format_type fmt; unsigned root, preamble, zcz; restricted_set_config rs; const char* name; };
  std::vector<pcase> cases;
  for (unsigned root : {0u, 1u, 500u, 837u}) {
    for (unsigned preamble : {0u, 13u, 63u}) {
      for (unsigned zcz : {0u, 1u, 12u, 15u}) {
        cases.push_back({prach_format_type::zero, root, preamble, zcz,
                         restricted_set_config::UNRESTRICTED, "0"});
      }
    }
  }
  for (unsigned root : {0u, 137u}) {
    for (unsigned preamble : {0u, 63u}) {
      for (unsigned zcz : {0u, 1u, 15u}) {
        cases.push_back({prach_format_type::B4, root, preamble, zcz,
                         restricted_set_config::UNRESTRICTED, "B4"});
        cases.push_back({prach_format_type::A1, root, preamble, zcz,
                         restricted_set_config::UNRESTRICTED, "A1"});
      }
    }
  }
  // NOTE: the reference prach_generator_impl ASSERTS on restricted sets
  // (prach_generator_impl.cpp:260 "Unrestricted sets are not implemented"),
  // so only unrestricted cases can be golden-generated.
  int idx = 0;
  for (const auto& c : cases) {
    prach_generator::configuration cfg;
    cfg.format = c.fmt;
    cfg.root_sequence_index = c.root;
    cfg.preamble_index = c.preamble;
    cfg.restricted_set = c.rs;
    cfg.zero_correlation_zone = c.zcz;
    span<const cf_t> out = gen.generate(cfg);
    std::string fo = "seq" + std::to_string(idx) + ".dat";
    write_dat(fo, reinterpret_cast<const float*>(out.data()), 2 * out.size());
    m.begin_case();
    m.field("format", std::string(c.name));
    m.field("root", (long long)c.root);
    m.field("preamble", (long long)c.preamble);
    m.field("zcz", (long long)c.zcz);
    m.field("restricted", (long long)(int)c.rs);
    m.field("len", (long long)out.size());
    m.field("seq", fo);
    m.end_case();
    ++idx;
  }
  m.flush();
}

} // namespace

void gen_dft_suite() { gen_dft(); }
void gen_ofdm_modulator_suite() { gen_ofdm_modulator(); }
void gen_ofdm_demodulator_suite() { gen_ofdm_demodulator(); }
void gen_equalizer_suite() { gen_equalizer(); }
void gen_prach_generator_suite() { gen_prach_generator(); }

// ----------------------------------------------------- channel estimator ----

#include "lib/phy/support/interpolator/interpolator_linear_impl.h"
#include "lib/phy/support/time_alignment_estimator/time_alignment_estimator_dft_impl.h"
#include "lib/phy/upper/signal_processors/channel_estimator/port_channel_estimator_average_impl.h"
#include "srsran/phy/upper/channel_estimation.h"

namespace {

std::unique_ptr<time_alignment_estimator> make_ta_estimator() {
  time_alignment_estimator_dft_impl::collection_dft_processors dfts;
  for (unsigned size = 128; size <= 8192; size *= 2) {
    dfts.emplace(size, std::make_unique<dft_processor_generic_impl>(
                           dft_processor::configuration{size, dft_processor::direction::INVERSE}));
  }
  return std::make_unique<time_alignment_estimator_dft_impl>(std::move(dfts));
}

void gen_estimator() {
  start("estimator");
  manifest m("manifest.json");
  auto rng = make_rng(0xE571);
  std::normal_distribution<float> noise_d(0.f, 1.f);

  struct ecase {
    unsigned nof_prb, layers;
    unsigned dmrs_type;      // 1 or 2
    unsigned symbol_mask;    // DM-RS symbols within the slot
    float snr_db;
    unsigned nof_taps;
    const char* smoothing;   // "filter" | "mean" | "none"
    const char* td;          // "average" | "interpolate"
    bool cfo;
    // Number of type-1 CDM groups carrying layers: group g maps layers
    // 2g..2g+1 onto RE offsets {g, g+2, ..., g+10} (TS 38.211 table
    // 6.4.1.1.3-1 delta).  1 for every pre-round-4 case.
    unsigned cdm_groups = 1;
  };
  std::vector<ecase> cases = {
      {52, 1, 1, (1u << 2) | (1u << 11), 20.f, 1, "filter", "average", true},
      {52, 1, 1, (1u << 2) | (1u << 7) | (1u << 11), 10.f, 3, "filter", "average", true},
      {106, 1, 3, (1u << 2) | (1u << 11), 15.f, 2, "filter", "average", true},   // PUCCH-F2 pattern
      {24, 1, 4, (1u << 4) | (1u << 9), 18.f, 2, "filter", "average", true},       // all-RE (PUCCH F3/F4)
      {24, 1, 1, (1u << 2), 30.f, 1, "mean", "average", false},
      {273, 1, 1, (1u << 2) | (1u << 11), 25.f, 4, "filter", "average", true},
      {52, 2, 1, (1u << 2) | (1u << 11), 20.f, 2, "filter", "average", false},
      {52, 1, 1, (1u << 2) | (1u << 6) | (1u << 10), 15.f, 2, "filter", "interpolate", true},
      // Round 4: multi-CDM-group coverage for the 4-layer flagship shape
      // (port_channel_estimator_average_impl.cpp:256 pairwise layer loop
      // with per-pair RE patterns).  Layers carry OCC structure (odd layer
      // = even-layer pilots with alternating frequency sign).
      {52, 4, 1, (1u << 2) | (1u << 11), 20.f, 2, "filter", "average", true, 2},
      {273, 4, 1, (1u << 2) | (1u << 11), 25.f, 4, "filter", "average", true, 2},
      {106, 3, 1, (1u << 2) | (1u << 7) | (1u << 11), 15.f, 2, "filter", "average", true, 2},
      {24, 4, 1, (1u << 2) | (1u << 11), 30.f, 1, "filter", "average", false, 2},
  };

  int idx = 0;
  for (const auto& c : cases) {
    ::fprintf(stderr, "estimator case %d\n", idx);
    auto smoothing = (std::string(c.smoothing) == "filter")
                         ? port_channel_estimator_fd_smoothing_strategy::filter
                         : ((std::string(c.smoothing) == "mean")
                                ? port_channel_estimator_fd_smoothing_strategy::mean
                                : port_channel_estimator_fd_smoothing_strategy::none);
    auto td = (std::string(c.td) == "average")
                  ? port_channel_estimator_td_interpolation_strategy::average
                  : port_channel_estimator_td_interpolation_strategy::interpolate;
    port_channel_estimator_average_impl est(std::make_unique<interpolator_linear_impl>(),
                                            make_ta_estimator(), smoothing, td, c.cfo);

    unsigned nof_symbols = 14;
    unsigned nof_subc = c.nof_prb * NRE;
    // DM-RS RE pattern within an RB: 1 = PUSCH type1, 3 = PUCCH F2,
    // 4 = all REs (PUCCH F3/F4).  (PUSCH type-2 {0,1,6,7} is NOT covered:
    // the reference interpolator configuration assumes a uniform stride,
    // configure_interpolator @ port_channel_estimator_helpers.cpp:298.)
    // With cdm_groups == 2 (type 1 only), group g occupies offsets
    // {g, g+2, ...} and carries layers 2g..2g+1.
    std::vector<bounded_bitset<NRE>> pat_g;
    for (unsigned g = 0; g != c.cdm_groups; ++g) {
      bounded_bitset<NRE> p(NRE);
      if (c.dmrs_type == 1) {
        for (unsigned k = g; k < NRE; k += 2) p.set(k);
      } else if (c.dmrs_type == 3) {
        for (unsigned k : {1u, 4u, 7u, 10u}) p.set(k);
      } else {
        p.fill(0, NRE);
      }
      pat_g.push_back(p);
    }
    const bounded_bitset<NRE>& re_pattern = pat_g.front();
    unsigned nof_dmrs_re_per_rb = re_pattern.count();

    port_channel_estimator::configuration cfg;
    cfg.scs = subcarrier_spacing::kHz30;
    cfg.cp = cyclic_prefix::NORMAL;
    cfg.first_symbol = 0;
    cfg.nof_symbols = nof_symbols;
    cfg.rx_ports = {0};
    cfg.scaling = 1.0f;
    for (unsigned l = 0; l != c.layers; ++l) {
      port_channel_estimator::layer_dmrs_pattern pat;
      pat.symbols = bounded_bitset<MAX_NSYMB_PER_SLOT>(nof_symbols);
      for (unsigned s = 0; s != nof_symbols; ++s)
        if (c.symbol_mask & (1u << s)) pat.symbols.set(s);
      pat.rb_mask = crb_bitmap(c.nof_prb);
      pat.rb_mask.fill(0, c.nof_prb);
      pat.rb_mask2 = crb_bitmap(c.nof_prb);
      pat.re_pattern = pat_g[std::min(l / 2, c.cdm_groups - 1)];
      cfg.dmrs_pattern.push_back(pat);
    }

    unsigned nof_dmrs_symbols = __builtin_popcount(c.symbol_mask);
    unsigned nof_pilots_per_symbol = c.nof_prb * nof_dmrs_re_per_rb;

    // Random QPSK pilots per layer/symbol.
    dmrs_symbol_list pilots({nof_pilots_per_symbol, nof_dmrs_symbols, c.layers});
    std::uniform_int_distribution<int> qpsk_d(0, 3);
    std::vector<cf_t> pilot_dump;
    for (unsigned l = 0; l != c.layers; ++l) {
      for (unsigned s = 0; s != nof_dmrs_symbols; ++s) {
        span<cf_t> dst = pilots.get_symbol(s, l);
        if (c.cdm_groups > 1 && (l % 2) == 1) {
          // OCC structure: odd layer = even-layer pilots with alternating
          // frequency sign (TS 38.211 w_f = {+1, -1}) — the structure the
          // pair averaging relies on for co-layer cancellation.
          span<const cf_t> even = pilots.get_symbol(s, l - 1);
          for (unsigned i = 0; i != dst.size(); ++i) {
            dst[i] = (i % 2) ? -even[i] : even[i];
            pilot_dump.push_back(dst[i]);
          }
          continue;
        }
        for (auto& p : dst) {
          int q = qpsk_d(rng);
          p = cf_t((q & 1) ? -(float)M_SQRT1_2 : (float)M_SQRT1_2,
                   (q & 2) ? -(float)M_SQRT1_2 : (float)M_SQRT1_2);
          pilot_dump.push_back(p);
        }
      }
    }

    // Synthesize a frequency-selective channel per layer and fill the grid.
    float sigma = std::pow(10.f, -c.snr_db / 20.f);
    dense_grid grid(1, nof_symbols, nof_subc);
    std::vector<std::vector<cf_t>> h_layer(c.layers, std::vector<cf_t>(nof_subc));
    std::uniform_real_distribution<float> delay_d(0.f, 100.f);
    for (unsigned l = 0; l != c.layers; ++l) {
      std::vector<float> delays(c.nof_taps);
      std::vector<cf_t> gains(c.nof_taps);
      for (unsigned t = 0; t != c.nof_taps; ++t) {
        delays[t] = delay_d(rng);  // in units of 1/4096 symbol
        gains[t] = cf_t(noise_d(rng), noise_d(rng)) * (1.f / std::sqrt(2.f * c.nof_taps));
      }
      if (c.nof_taps == 1) gains[0] = cf_t(1.0f, 0.0f);
      for (unsigned k = 0; k != nof_subc; ++k) {
        cf_t h = 0;
        for (unsigned t = 0; t != c.nof_taps; ++t) {
          float ph = -2.f * (float)M_PI * (float)k * delays[t] / 4096.f;
          h += gains[t] * cf_t(std::cos(ph), std::sin(ph));
        }
        h_layer[l][k] = h;
      }
    }

    // Grid = sum_l pilot_l * h_l + noise on DM-RS REs (data REs left noisy).
    for (unsigned sym = 0, s_idx = 0; sym != nof_symbols; ++sym) {
      bool is_dmrs = (c.symbol_mask >> sym) & 1;
      for (unsigned k = 0; k != nof_subc; ++k) {
        cf_t v = sigma * (float)M_SQRT1_2 * cf_t(noise_d(rng), noise_d(rng));
        if (is_dmrs) {
          unsigned rb = k / NRE, re = k % NRE;
          for (unsigned g = 0; g != c.cdm_groups; ++g) {
            if (!pat_g[g].test(re)) continue;
            // Pilot index within symbol (within this group's pattern).
            unsigned nof_before = rb * nof_dmrs_re_per_rb;
            for (unsigned r = 0; r != re; ++r)
              if (pat_g[g].test(r)) ++nof_before;
            unsigned l_end = std::min(2 * g + 2, c.layers);
            if (c.cdm_groups == 1) l_end = c.layers;
            for (unsigned l = 2 * g; l < l_end; ++l) {
              v += to_cf(pilots.get_symbol(s_idx, l)[nof_before]) * h_layer[l][k];
            }
          }
        }
        grid.at(0, sym, k) = to_cbf16(v);
      }
      if (is_dmrs) ++s_idx;
    }

    // Run the estimator.
    channel_estimate::channel_estimate_dimensions dims;
    dims.nof_prb = c.nof_prb;
    dims.nof_symbols = nof_symbols;
    dims.nof_rx_ports = 1;
    dims.nof_tx_layers = c.layers;
    channel_estimate estimate(dims);
    est.compute(estimate, grid, 0, pilots, cfg);

    // Dump inputs and outputs.
    std::string base = std::to_string(idx);
    std::vector<cf_t> grid_dump;
    for (unsigned sym = 0; sym != nof_symbols; ++sym)
      for (unsigned k = 0; k != nof_subc; ++k) grid_dump.push_back(to_cf(grid.at(0, sym, k)));
    write_dat("grid" + base + ".dat", reinterpret_cast<const float*>(grid_dump.data()),
              2 * grid_dump.size());
    write_dat("pilots" + base + ".dat", reinterpret_cast<const float*>(pilot_dump.data()),
              2 * pilot_dump.size());
    std::vector<cf_t> ce_dump;
    for (unsigned l = 0; l != c.layers; ++l)
      for (unsigned sym = 0; sym != nof_symbols; ++sym) {
        span<const cbf16_t> row = estimate.get_symbol_ch_estimate(sym, 0, l);
        for (auto v : row) ce_dump.push_back(to_cf(v));
      }
    write_dat("ce" + base + ".dat", reinterpret_cast<const float*>(ce_dump.data()),
              2 * ce_dump.size());

    m.begin_case();
    m.field("nof_prb", (long long)c.nof_prb);
    m.field("layers", (long long)c.layers);
    m.field("dmrs_type", (long long)c.dmrs_type);
    m.field("symbol_mask", (long long)c.symbol_mask);
    m.field("snr_db", (double)c.snr_db);
    m.field("smoothing", std::string(c.smoothing));
    m.field("td", std::string(c.td));
    m.field("cfo_comp", (long long)(c.cfo ? 1 : 0));
    m.field("cdm_groups", (long long)c.cdm_groups);
    m.field("noise_var", (double)estimate.get_noise_variance(0));
    m.field("rsrp", (double)estimate.get_rsrp(0, 0));
    m.field("epre", (double)estimate.get_epre(0));
    m.field("snr_est", (double)estimate.get_snr(0));
    m.field("ta_us", (double)estimate.get_time_alignment(0, 0).to_seconds() * 1e6);
    {
      auto cfo = estimate.get_cfo_Hz(0, 0);
      m.field("cfo_hz", (double)(cfo.has_value() ? *cfo : 0.0));
    }
    m.field("idx", (long long)idx);
    m.end_case();
    ++idx;
  }
  m.flush();
}

} // namespace

void gen_estimator_suite() { gen_estimator(); }

// -------------------------------------------------------- prach detector ----

#include "lib/phy/upper/channel_processors/prach_detector_generic_impl.h"
#include "srsran/phy/support/prach_buffer.h"

namespace {

class dense_prach_buffer : public prach_buffer {
public:
  dense_prach_buffer(unsigned ports, unsigned symbols, unsigned l_ra)
      : ports_(ports), symbols_(symbols), l_ra_(l_ra), data_(ports * symbols * l_ra) {}
  cbf16_t& at(unsigned p, unsigned s, unsigned k) {
    return data_[(p * symbols_ + s) * l_ra_ + k];
  }
  unsigned get_max_nof_ports() const override { return ports_; }
  unsigned get_max_nof_td_occasions() const override { return 1; }
  unsigned get_max_nof_fd_occasions() const override { return 1; }
  unsigned get_max_nof_symbols() const override { return symbols_; }
  unsigned get_sequence_length() const override { return l_ra_; }
  span<cbf16_t> get_symbol(unsigned port, unsigned, unsigned, unsigned symbol) override {
    return span<cbf16_t>(&at(port, symbol, 0), l_ra_);
  }
  span<const cbf16_t> get_symbol(unsigned port, unsigned, unsigned, unsigned symbol) const override {
    return span<const cbf16_t>(&data_[(port * symbols_ + symbol) * l_ra_], l_ra_);
  }

private:
  unsigned ports_, symbols_, l_ra_;
  std::vector<cbf16_t> data_;
};

void gen_prach_detector() {
  start("prach_detector");
  manifest m("manifest.json");
  auto rng = make_rng(0xDE7C);
  std::normal_distribution<float> noise_d(0.f, 1.f);
  prach_generator_impl ref_gen;

  struct dcase {
    prach_format_type fmt; const char* name;
    unsigned root, zcz, ports, nof_symbols, preamble;
    float snr_db, delay_samples;  // delay at the 1024 idft grid
    bool noise_only;
  };
  std::vector<dcase> cases = {
      {prach_format_type::zero, "0", 1, 1, 1, 1, 7, 10.f, 3.f, false},
      {prach_format_type::zero, "0", 1, 1, 1, 1, 23, 6.f, 5.f, false},
      {prach_format_type::zero, "0", 5, 0, 2, 1, 41, 4.f, 8.f, false},
      {prach_format_type::zero, "0", 1, 11, 1, 1, 12, 8.f, 2.f, false},
      {prach_format_type::one, "1", 3, 5, 1, 2, 9, 4.f, 4.f, false},
      {prach_format_type::B4, "B4", 7, 11, 1, 12, 30, 0.f, 1.f, false},
      {prach_format_type::A1, "A1", 2, 14, 2, 2, 50, 6.f, 0.5f, false},
      {prach_format_type::zero, "0", 1, 1, 1, 1, 0, 0.f, 0.f, true},
      {prach_format_type::B4, "B4", 7, 11, 1, 12, 0, 0.f, 0.f, true},
  };
  int idx = 0;
  for (const auto& c : cases) {
    unsigned l_ra = is_long_preamble(c.fmt) ? 839 : 139;
    prach_detector_generic_impl det(
        std::make_unique<dft_processor_generic_impl>(
            dft_processor::configuration{1024, dft_processor::direction::INVERSE}),
        std::make_unique<dft_processor_generic_impl>(
            dft_processor::configuration{1024, dft_processor::direction::INVERSE}),
        std::make_unique<prach_generator_impl>(),
        /*combine_symbols=*/true);

    // Build the received preamble: shifted root with a delay phase ramp + AWGN.
    prach_generator::configuration gcfg;
    gcfg.format = c.fmt;
    gcfg.root_sequence_index = c.root;
    gcfg.preamble_index = c.preamble;
    gcfg.restricted_set = restricted_set_config::UNRESTRICTED;
    gcfg.zero_correlation_zone = c.zcz;
    std::vector<cf_t> y(l_ra);
    if (!c.noise_only) {
      span<const cf_t> gen_out = ref_gen.generate(gcfg);
      std::copy(gen_out.begin(), gen_out.end(), y.begin());
    }

    dense_prach_buffer buf(c.ports, c.nof_symbols, l_ra);
    float amp = std::sqrt(static_cast<float>(l_ra)); // per-bin signal amplitude
    float sigma = amp * std::pow(10.f, -c.snr_db / 20.f) / std::sqrt(2.f);
    std::vector<cf_t> dump;
    for (unsigned p = 0; p != c.ports; ++p) {
      for (unsigned s = 0; s != c.nof_symbols; ++s) {
        for (unsigned k = 0; k != l_ra; ++k) {
          int ks = (k < (l_ra + 1) / 2) ? (int)k : (int)k - (int)l_ra;
          float ph = -2.f * (float)M_PI * (float)ks * c.delay_samples / 1024.f;
          cf_t v = c.noise_only ? cf_t(noise_d(rng), noise_d(rng))
                                : y[k] * cf_t(std::cos(ph), std::sin(ph)) +
                                      sigma * cf_t(noise_d(rng), noise_d(rng));
          buf.at(p, s, k) = to_cbf16(v);
          dump.push_back(to_cf(buf.at(p, s, k)));
        }
      }
    }
    std::string frx = "rx" + std::to_string(idx) + ".dat";
    write_dat(frx, reinterpret_cast<const float*>(dump.data()), 2 * dump.size());

    prach_detector::configuration dcfg;
    dcfg.root_sequence_index = c.root;
    dcfg.format = c.fmt;
    dcfg.restricted_set = restricted_set_config::UNRESTRICTED;
    dcfg.zero_correlation_zone = c.zcz;
    dcfg.start_preamble_index = 0;
    dcfg.nof_preamble_indices = 64;
    dcfg.ra_scs = is_long_preamble(c.fmt)
                      ? (c.fmt == prach_format_type::three ? prach_subcarrier_spacing::kHz5
                                                           : prach_subcarrier_spacing::kHz1_25)
                      : prach_subcarrier_spacing::kHz15;
    dcfg.nof_rx_ports = c.ports;
    prach_detection_result res = det.detect(buf, dcfg);

    std::string base = std::to_string(idx);
    m.begin_case();
    m.field("format", std::string(c.name));
    m.field("root", (long long)c.root);
    m.field("zcz", (long long)c.zcz);
    m.field("ports", (long long)c.ports);
    m.field("nof_symbols", (long long)c.nof_symbols);
    m.field("preamble", (long long)c.preamble);
    m.field("snr_db", (double)c.snr_db);
    m.field("delay_samples", (double)c.delay_samples);
    m.field("noise_only", (long long)(c.noise_only ? 1 : 0));
    m.field("l_ra", (long long)l_ra);
    m.field("rx", frx);
    m.field("rssi_db", (double)res.rssi_dB);
    m.field("nof_detected", (long long)res.preambles.size());
    {
      std::string pre, met, ta;
      for (const auto& p : res.preambles) {
        if (!pre.empty()) { pre += ","; met += ","; ta += ","; }
        pre += std::to_string(p.preamble_index);
        met += std::to_string(p.detection_metric);
        ta += std::to_string(p.time_advance.to_seconds() * 1e6);
      }
      m.field("det_preambles", pre);
      m.field("det_metrics", met);
      m.field("det_ta_us", ta);
    }
    m.field("idx", (long long)idx);
    m.end_case();
    ++idx;
  }
  m.flush();
}

} // namespace

void gen_prach_detector_suite() { gen_prach_detector(); }

// ---------------------------------------------------------- dmrs mapping ----

#include "lib/phy/generic_functions/precoding/channel_precoder_generic.h"
#include "lib/phy/support/resource_grid_mapper_impl.h"
#include "lib/phy/upper/sequence_generators/pseudo_random_generator_impl.h"
#include "lib/phy/upper/signal_processors/pdcch/dmrs_pdcch_processor_impl.h"
#include "lib/phy/upper/signal_processors/pdsch/dmrs_pdsch_processor_impl.h"
#include "srsran/ran/precoding/precoding_codebooks.h"

namespace {

void gen_dmrs_pdsch() {
  start("dmrs_pdsch");
  manifest m("manifest.json");
  struct dcase {
    unsigned nof_prb, scrambling_id, symbol_mask, nof_layers;
    bool n_scid;
    unsigned dmrs_type;  // 1 or 2
    unsigned sfn, slot_in_frame;
  };
  std::vector<dcase> cases = {
      {24, 1, (1u << 2), 1, false, 1, 0, 0},
      {52, 500, (1u << 2) | (1u << 11), 1, true, 1, 12, 7},
      {106, 1007, (1u << 2) | (1u << 7) | (1u << 11), 2, false, 1, 800, 19},
      {52, 77, (1u << 2) | (1u << 11), 2, false, 2, 3, 4},
      {273, 123, (1u << 2) | (1u << 11), 4, false, 1, 100, 10},
  };
  int idx = 0;
  for (const auto& c : cases) {
    dmrs_pdsch_processor_impl proc(
        std::make_unique<pseudo_random_generator_impl>(),
        std::make_unique<resource_grid_mapper_impl>(
            std::make_unique<channel_precoder_generic>()));
    unsigned nof_subc = c.nof_prb * NRE;
    dense_grid grid(c.nof_layers, 14, nof_subc);
    dmrs_pdsch_processor::config_t cfg;
    cfg.slot = slot_point(to_numerology_value(subcarrier_spacing::kHz30), c.sfn,
                          c.slot_in_frame);
    cfg.reference_point_k_rb = 0;
    cfg.type = (c.dmrs_type == 1) ? dmrs_type::TYPE1 : dmrs_type::TYPE2;
    cfg.scrambling_id = c.scrambling_id;
    cfg.n_scid = c.n_scid;
    cfg.amplitude = 1.0f;
    cfg.symbols_mask = symbol_slot_mask(14);
    for (unsigned s = 0; s != 14; ++s)
      if (c.symbol_mask & (1u << s)) cfg.symbols_mask.set(s);
    cfg.rb_mask = crb_bitmap(c.nof_prb);
    cfg.rb_mask.fill(0, c.nof_prb);
    cfg.precoding = precoding_configuration::make_wideband(
        make_identity(c.nof_layers));
    proc.map(grid, cfg);

    std::vector<cf_t> dump;
    for (unsigned p = 0; p != c.nof_layers; ++p)
      for (unsigned s = 0; s != 14; ++s)
        for (unsigned k = 0; k != nof_subc; ++k) dump.push_back(to_cf(grid.at(p, s, k)));
    std::string fo = "grid" + std::to_string(idx) + ".dat";
    write_dat(fo, reinterpret_cast<const float*>(dump.data()), 2 * dump.size());
    m.begin_case();
    m.field("nof_prb", (long long)c.nof_prb);
    m.field("scrambling_id", (long long)c.scrambling_id);
    m.field("symbol_mask", (long long)c.symbol_mask);
    m.field("nof_layers", (long long)c.nof_layers);
    m.field("n_scid", (long long)(c.n_scid ? 1 : 0));
    m.field("dmrs_type", (long long)c.dmrs_type);
    m.field("sfn", (long long)c.sfn);
    m.field("slot_in_frame", (long long)c.slot_in_frame);
    m.field("grid", fo);
    m.field("idx", (long long)idx);
    m.end_case();
    ++idx;
  }
  m.flush();
}

void gen_dmrs_pdcch() {
  start("dmrs_pdcch");
  manifest m("manifest.json");
  struct pcase { unsigned nof_prb, coreset_prbs, start_symbol, duration, n_id, sfn, slot; };
  std::vector<pcase> cases = {
      {52, 24, 0, 1, 1, 0, 0},
      {106, 48, 0, 2, 500, 20, 3},
      {273, 48, 1, 3, 1007, 512, 17},
  };
  int idx = 0;
  for (const auto& c : cases) {
    dmrs_pdcch_processor_impl proc(
        std::make_unique<pseudo_random_generator_impl>(),
        std::make_unique<resource_grid_mapper_impl>(
            std::make_unique<channel_precoder_generic>()));
    unsigned nof_subc = c.nof_prb * NRE;
    dense_grid grid(1, 14, nof_subc);
    dmrs_pdcch_processor::config_t cfg;
    cfg.slot = slot_point(to_numerology_value(subcarrier_spacing::kHz30), c.sfn, c.slot);
    cfg.cp = cyclic_prefix::NORMAL;
    cfg.reference_point_k_rb = 0;
    cfg.rb_mask = crb_bitmap(c.nof_prb);
    cfg.rb_mask.fill(0, c.coreset_prbs);
    cfg.start_symbol_index = c.start_symbol;
    cfg.duration = c.duration;
    cfg.n_id = c.n_id;
    cfg.amplitude = 1.0f;
    cfg.precoding = precoding_configuration::make_wideband(make_identity(1));
    proc.map(grid, cfg);
    std::vector<cf_t> dump;
    for (unsigned s = 0; s != 14; ++s)
      for (unsigned k = 0; k != nof_subc; ++k) dump.push_back(to_cf(grid.at(0, s, k)));
    std::string fo = "grid" + std::to_string(idx) + ".dat";
    write_dat(fo, reinterpret_cast<const float*>(dump.data()), 2 * dump.size());
    m.begin_case();
    m.field("nof_prb", (long long)c.nof_prb);
    m.field("coreset_prbs", (long long)c.coreset_prbs);
    m.field("start_symbol", (long long)c.start_symbol);
    m.field("duration", (long long)c.duration);
    m.field("n_id", (long long)c.n_id);
    m.field("sfn", (long long)c.sfn);
    m.field("slot_in_frame", (long long)c.slot);
    m.field("grid", fo);
    m.field("idx", (long long)idx);
    m.end_case();
    ++idx;
  }
  m.flush();
}

} // namespace

void gen_dmrs_suites() {
  gen_dmrs_pdsch();
  gen_dmrs_pdcch();
}

// ---------------------------------------------------------------------------
// PRACH OFDM demodulator suite: the reference's window math (16-kappa CP
// extensions, occasion offsets, DC-centred frequency mapping) over random
// baseband (the demodulator is linear, so noise input pins it fully).
// Reference: lib/phy/lower/modulation/ofdm_prach_demodulator_impl.cpp.
#include "lib/phy/lower/modulation/ofdm_prach_demodulator_impl.h"
#include "lib/phy/support/prach_buffer_impl.h"
#include "srsran/phy/lower/sampling_rate.h"
#include "srsran/ran/prach/prach_preamble_information.h"

namespace {

void gen_prach_demodulator() {
  start("prach_demodulator");
  refgen::manifest m("manifest.json");
  auto rng = make_rng(0xDE30);
  std::normal_distribution<float> nd(0.f, 1.f);

  struct dcase {
    prach_format_type fmt;
    const char* fmt_name;
    unsigned slot_idx, start_symbol, nof_td, nof_fd, rb_offset, nof_prb_ul;
    unsigned l_ra;
  };
  // All cases at 30 kHz PUSCH SCS (numerology 1), 61.44 Msps.
  std::vector<dcase> cases = {
      {prach_format_type::zero, "0", 0, 0, 1, 1, 3, 106, 839},
      {prach_format_type::three, "3", 0, 0, 1, 1, 10, 106, 839},
      {prach_format_type::B4, "B4", 1, 2, 1, 2, 4, 51, 139},
      {prach_format_type::A2, "A2", 0, 0, 2, 1, 0, 51, 139},
      {prach_format_type::C0, "C0", 1, 0, 1, 1, 7, 51, 139},
  };

  sampling_rate srate = sampling_rate::from_MHz(61.44);
  int idx = 0;
  for (const auto& c : cases) {
    ofdm_prach_demodulator_impl::dft_processors_table dfts;
    for (auto scs : {prach_subcarrier_spacing::kHz1_25, prach_subcarrier_spacing::kHz5,
                     prach_subcarrier_spacing::kHz15, prach_subcarrier_spacing::kHz30}) {
      unsigned size = srate.to_Hz() / ra_scs_to_Hz(scs);
      dfts.emplace(scs, std::make_unique<dft_processor_generic_impl>(
                            dft_processor::configuration{size, dft_processor::direction::DIRECT}));
    }
    ofdm_prach_demodulator_impl demod(srate, std::move(dfts));

    // Size the input generously: a full 0.5 ms slot plus a long preamble.
    unsigned nof_input = (unsigned)(srate.to_Hz() * 15e-4);
    std::vector<cf_t> input(nof_input);
    for (auto& v : input) v = cf_t(nd(rng), nd(rng));

    unsigned nof_symbols =
        is_long_preamble(c.fmt)
            ? get_prach_preamble_long_info(c.fmt).nof_symbols
            : get_prach_preamble_short_info(c.fmt, prach_subcarrier_spacing::kHz30, true).nof_symbols;
    prach_buffer_impl buffer(1, c.nof_td, c.nof_fd, nof_symbols, c.l_ra);

    ofdm_prach_demodulator::configuration cfg;
    cfg.slot = slot_point(1, 0, c.slot_idx);
    cfg.format = c.fmt;
    cfg.nof_td_occasions = c.nof_td;
    cfg.nof_fd_occasions = c.nof_fd;
    cfg.start_symbol = c.start_symbol;
    cfg.rb_offset = c.rb_offset;
    cfg.nof_prb_ul_grid = c.nof_prb_ul;
    cfg.port = 0;
    demod.demodulate(buffer, input, cfg);

    std::string base = std::to_string(idx);
    write_dat("input" + base + ".dat", reinterpret_cast<const float*>(input.data()),
              2 * input.size());
    std::vector<cf_t> out;
    for (unsigned td = 0; td != c.nof_td; ++td)
      for (unsigned fd = 0; fd != c.nof_fd; ++fd)
        for (unsigned s = 0; s != nof_symbols; ++s) {
          span<const cbf16_t> sym =
              static_cast<const prach_buffer&>(buffer).get_symbol(0, td, fd, s);
          for (unsigned i = 0; i != c.l_ra; ++i) out.push_back(to_cf(sym[i]));
        }
    write_dat("buffer" + base + ".dat", reinterpret_cast<const float*>(out.data()),
              2 * out.size());

    m.begin_case();
    m.field("idx", (long long)idx);
    m.field("fmt", std::string(c.fmt_name));
    m.field("slot_idx", (long long)c.slot_idx);
    m.field("start_symbol", (long long)c.start_symbol);
    m.field("nof_td", (long long)c.nof_td);
    m.field("nof_fd", (long long)c.nof_fd);
    m.field("rb_offset", (long long)c.rb_offset);
    m.field("nof_prb_ul", (long long)c.nof_prb_ul);
    m.field("l_ra", (long long)c.l_ra);
    m.field("nof_symbols", (long long)nof_symbols);
    m.field("srate_hz", (double)srate.to_Hz());
    m.end_case();
    ++idx;
  }
  m.flush();
}

} // namespace

void gen_prach_demodulator_suite() { gen_prach_demodulator(); }
