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
