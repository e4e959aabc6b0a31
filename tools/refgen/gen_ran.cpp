// Golden generators for the lib/ran derived-parameter library and the
// polar / short-block codecs — all pure functions of integer configs,
// dumped as JSON manifests (+ .dat bit/LLR vectors for the codecs).

#include "common.h"

#include "lib/phy/upper/channel_coding/polar/polar_allocator_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_code_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_deallocator_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_decoder_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_encoder_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_interleaver_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_rate_dematcher_impl.h"
#include "lib/phy/upper/channel_coding/polar/polar_rate_matcher_impl.h"
#include "lib/phy/upper/channel_coding/short/short_block_detector_impl.h"
#include "lib/phy/upper/channel_coding/short/short_block_encoder_impl.h"
#include "srsran/ran/pdsch/dlsch_info.h"
#include "srsran/ran/pusch/pusch_mcs.h"
#include "srsran/ran/pusch/pusch_uci_beta_offset.h"
#include "srsran/ran/pusch/ulsch_info.h"
#include "srsran/ran/sch/tbs_calculator.h"

#include <cmath>
#include <cstring>

using namespace srsran;
using namespace refgen;

extern std::string g_root_outdir;

namespace {
void start(const std::string& name) { set_outdir(g_root_outdir + "/" + name); }
}

// ------------------------------------------------------------------ tbs ----

void gen_ran_tbs() {
  start("ran_tbs");
  manifest m("manifest.json");
  const modulation_scheme mods[] = {modulation_scheme::QPSK, modulation_scheme::QAM16,
                                    modulation_scheme::QAM64, modulation_scheme::QAM256};
  const float rates[] = {0.076171875f, 0.30078125f, 0.438476562f, 0.650390625f, 0.92578125f};
  for (unsigned nof_symb : {2u, 7u, 12u, 14u}) {
    for (unsigned dmrs_prb : {12u, 24u, 36u}) {
      for (unsigned oh : {0u, 6u, 18u}) {
        for (auto mod : mods) {
          for (float rate : rates) {
            for (unsigned layers : {1u, 2u, 4u}) {
              for (unsigned n_prb : {1u, 4u, 24u, 106u, 270u, 275u}) {
                tbs_calculator_configuration cfg = {};
                cfg.nof_symb_sh = nof_symb;
                cfg.nof_dmrs_prb = dmrs_prb;
                cfg.nof_oh_prb = oh;
                cfg.mcs_descr = {mod, rate * 1024.f};
                cfg.nof_layers = layers;
                cfg.tb_scaling_field = 0;
                cfg.n_prb = n_prb;
                unsigned tbs = tbs_calculator_calculate(cfg);
                m.begin_case();
                m.field("nof_symb", (long long)nof_symb);
                m.field("dmrs_prb", (long long)dmrs_prb);
                m.field("oh", (long long)oh);
                m.field("qm", (long long)(unsigned)mod);
                m.field("rate1024", (double)(rate * 1024.f));
                m.field("layers", (long long)layers);
                m.field("n_prb", (long long)n_prb);
                m.field("tbs", (long long)tbs);
                m.end_case();
              }
            }
          }
        }
      }
    }
  }
  m.flush();
}

// ------------------------------------------------------------------ mcs ----

void gen_ran_mcs() {
  start("ran_mcs");
  manifest m("manifest.json");
  const std::pair<pusch_mcs_table, const char*> tables[] = {
      {pusch_mcs_table::qam64, "qam64"},
      {pusch_mcs_table::qam256, "qam256"},
      {pusch_mcs_table::qam64LowSe, "qam64LowSe"},
  };
  for (auto [table, tname] : tables) {
    unsigned max_mcs = (table == pusch_mcs_table::qam256) ? 28 : 29;
    for (unsigned tp = 0; tp < 2; ++tp) {
      for (unsigned idx = 0; idx < max_mcs; ++idx) {
        sch_mcs_description d = pusch_mcs_get_config(table, idx, tp != 0, false);
        m.begin_case();
        m.field("table", std::string(tname));
        m.field("tp", (long long)tp);
        m.field("mcs", (long long)idx);
        m.field("qm", (long long)get_bits_per_symbol(d.modulation));
        m.field("r1024", (double)d.target_code_rate);
        m.end_case();
      }
    }
  }
  m.flush();
}

// ----------------------------------------------------------- beta offset ----

void gen_ran_beta() {
  start("ran_beta");
  manifest m("manifest.json");
  for (unsigned v = 0; v < 16; ++v) {
    m.begin_case();
    m.field("kind", std::string("harq_ack"));
    m.field("index", (long long)v);
    m.field("value", (double)beta_harq_ack_to_float(v));
    m.end_case();
  }
  for (unsigned v = 0; v < 19; ++v) {
    m.begin_case();
    m.field("kind", std::string("csi"));
    m.field("index", (long long)v);
    m.field("value", (double)beta_csi_to_float(v));
    m.end_case();
  }
  m.flush();
}

// ----------------------------------------------------------- ulsch info ----

void gen_ulsch_info() {
  start("ulsch_info");
  manifest m("manifest.json");
  struct ucase {
    unsigned tbs_bytes, ack, csi1, csi2, nof_rb, start_sym, nof_symbols, cdm, layers;
    modulation_scheme mod;
    float rate;
    dmrs_config_type dmrs;
    unsigned dmrs_mask; // bitmask over 14 symbols
    bool dc;
  };
  std::vector<ucase> cases;
  for (unsigned ack : {0u, 1u, 2u, 11u, 24u}) {
    for (unsigned csi1 : {0u, 4u, 11u, 44u}) {
      for (unsigned csi2 : {0u, 7u}) {
        cases.push_back({96, ack, csi1, csi2, 24, 0, 14, 2, 1, modulation_scheme::QAM16, 0.5f,
                         dmrs_config_type::type1, (1u << 2) | (1u << 11), false});
      }
    }
  }
  cases.push_back({1024, 2, 4, 0, 106, 0, 14, 2, 2, modulation_scheme::QAM64, 0.65f,
                   dmrs_config_type::type1, (1u << 2) | (1u << 7) | (1u << 11), false});
  cases.push_back({4096, 1, 0, 0, 270, 0, 14, 2, 4, modulation_scheme::QAM256, 0.85f,
                   dmrs_config_type::type1, (1u << 2) | (1u << 11), true});
  cases.push_back({0, 4, 11, 7, 24, 0, 14, 2, 1, modulation_scheme::QPSK, 0.3f,
                   dmrs_config_type::type2, (1u << 2) | (1u << 11), false});
  cases.push_back({48, 1, 0, 0, 4, 2, 12, 1, 1, modulation_scheme::QPSK, 0.3f,
                   dmrs_config_type::type1, (1u << 3) | (1u << 10), false});

  int idx = 0;
  for (const auto& c : cases) {
    ulsch_configuration cfg = {};
    cfg.tbs = units::bits(c.tbs_bytes * 8);
    cfg.mcs_descr = {c.mod, c.rate * 1024.f};
    cfg.nof_harq_ack_bits = units::bits(c.ack);
    cfg.nof_csi_part1_bits = units::bits(c.csi1);
    cfg.nof_csi_part2_bits = units::bits(c.csi2);
    cfg.alpha_scaling = 1.0f;
    cfg.beta_offset_harq_ack = 2.0f;
    cfg.beta_offset_csi_part1 = 2.0f;
    cfg.beta_offset_csi_part2 = 2.0f;
    cfg.nof_rb = c.nof_rb;
    cfg.start_symbol_index = c.start_sym;
    cfg.nof_symbols = c.nof_symbols;
    cfg.dmrs_type = c.dmrs;
    cfg.dmrs_symbol_mask = bounded_bitset<MAX_NSYMB_PER_SLOT>(14);
    for (unsigned s = 0; s < 14; ++s)
      if (c.dmrs_mask & (1u << s)) cfg.dmrs_symbol_mask.set(s);
    cfg.nof_cdm_groups_without_data = c.cdm;
    cfg.nof_layers = c.layers;
    cfg.contains_dc = c.dc;
    ulsch_information info = get_ulsch_information(cfg);
    m.begin_case();
    m.field("tbs", (long long)(c.tbs_bytes * 8));
    m.field("qm", (long long)get_bits_per_symbol(c.mod));
    m.field("rate1024", (double)(c.rate * 1024.f));
    m.field("ack", (long long)c.ack);
    m.field("csi1", (long long)c.csi1);
    m.field("csi2", (long long)c.csi2);
    m.field("nof_rb", (long long)c.nof_rb);
    m.field("start_sym", (long long)c.start_sym);
    m.field("nof_symbols", (long long)c.nof_symbols);
    m.field("dmrs_type", (long long)(c.dmrs == dmrs_config_type::type1 ? 1 : 2));
    m.field("dmrs_mask", (long long)c.dmrs_mask);
    m.field("cdm_groups", (long long)c.cdm);
    m.field("layers", (long long)c.layers);
    m.field("contains_dc", (long long)(c.dc ? 1 : 0));
    m.field("alpha", (double)1.0);
    m.field("beta_ack", (double)2.0);
    m.field("beta_csi1", (double)2.0);
    m.field("beta_csi2", (double)2.0);
    // outputs
    m.field("g_ulsch", (long long)info.nof_ul_sch_bits.value());
    m.field("g_ack", (long long)info.nof_harq_ack_bits.value());
    m.field("g_ack_rvd", (long long)info.nof_harq_ack_rvd.value());
    m.field("g_csi1", (long long)info.nof_csi_part1_bits.value());
    m.field("g_csi2", (long long)info.nof_csi_part2_bits.value());
    m.field("q_ack", (long long)info.nof_harq_ack_re);
    m.field("q_csi1", (long long)info.nof_csi_part1_re);
    m.field("q_csi2", (long long)info.nof_csi_part2_re);
    m.field("dc_overlap_bits", (long long)info.nof_dc_overlap_bits.value());
    if (info.sch.has_value()) {
      m.field("sch_nof_cb", (long long)info.sch->nof_cb);
      m.field("sch_bits_per_cb", (long long)info.sch->nof_bits_per_cb.value());
      m.field("sch_filler_per_cb", (long long)info.sch->nof_filler_bits_per_cb.value());
    }
    m.end_case();
    ++idx;
  }
  m.flush();
}

// ----------------------------------------------------------- dlsch info ----

void gen_dlsch_info() {
  start("dlsch_info");
  manifest m("manifest.json");
  struct dcase {
    unsigned tbs_bits, nof_rb, start_sym, nof_symbols, cdm, layers;
    modulation_scheme mod;
    float rate;
    unsigned dmrs_mask;
  };
  std::vector<dcase> cases = {
      {768, 24, 1, 13, 1, 1, modulation_scheme::QPSK, 0.3f, (1u << 2)},
      {8192, 106, 0, 14, 2, 2, modulation_scheme::QAM64, 0.65f, (1u << 2) | (1u << 11)},
      {147576, 270, 0, 14, 2, 4, modulation_scheme::QAM256, 0.89f, (1u << 2) | (1u << 11)},
      {3824, 52, 2, 12, 2, 1, modulation_scheme::QAM16, 0.5f, (1u << 3) | (1u << 10)},
  };
  for (const auto& c : cases) {
    dlsch_configuration cfg = {};
    cfg.tbs = units::bits(c.tbs_bits);
    cfg.mcs_descr = {c.mod, c.rate * 1024.f};
    cfg.nof_rb = c.nof_rb;
    cfg.start_symbol_index = c.start_sym;
    cfg.nof_symbols = c.nof_symbols;
    cfg.dmrs_type = dmrs_config_type::type1;
    cfg.dmrs_symbol_mask = bounded_bitset<MAX_NSYMB_PER_SLOT>(14);
    for (unsigned s = 0; s < 14; ++s)
      if (c.dmrs_mask & (1u << s)) cfg.dmrs_symbol_mask.set(s);
    cfg.nof_cdm_groups_without_data = c.cdm;
    cfg.nof_layers = c.layers;
    cfg.contains_dc = false;
    dlsch_information info = get_dlsch_information(cfg);
    m.begin_case();
    m.field("tbs", (long long)c.tbs_bits);
    m.field("qm", (long long)get_bits_per_symbol(c.mod));
    m.field("rate1024", (double)(c.rate * 1024.f));
    m.field("nof_rb", (long long)c.nof_rb);
    m.field("start_sym", (long long)c.start_sym);
    m.field("nof_symbols", (long long)c.nof_symbols);
    m.field("dmrs_mask", (long long)c.dmrs_mask);
    m.field("cdm_groups", (long long)c.cdm);
    m.field("layers", (long long)c.layers);
    m.field("g_dlsch", (long long)info.nof_dl_sch_bits.value());
    m.field("sch_nof_cb", (long long)info.sch.nof_cb);
    m.field("sch_bits_per_cb", (long long)info.sch.nof_bits_per_cb.value());
    m.field("sch_filler_per_cb", (long long)info.sch.nof_filler_bits_per_cb.value());
    m.end_case();
  }
  m.flush();
}

// ---------------------------------------------------------------- polar ----

void gen_polar() {
  start("polar");
  manifest m("manifest.json");
  auto rng = make_rng(0x9014);
  polar_code_impl code;
  polar_encoder_impl enc;
  polar_allocator_impl alloc;
  polar_deallocator_impl dealloc;
  polar_interleaver_impl interleaver;
  polar_rate_matcher_impl rm;
  polar_rate_dematcher_impl rdm;
  polar_decoder_impl dec(std::make_unique<polar_encoder_impl>(), polar_code::NMAX_LOG);
  std::normal_distribution<float> noise_d(0.f, 1.f);

  struct pcase { unsigned K, E; uint8_t nMax; polar_code_ibil ibil; };
  std::vector<pcase> cases = {
      // UCI-style (nMax=10, with block interleaving)
      {18, 48, 10, polar_code_ibil::present},
      {23, 72, 10, polar_code_ibil::present},
      {32, 128, 10, polar_code_ibil::present},
      {54, 216, 10, polar_code_ibil::present},
      {80, 256, 10, polar_code_ibil::present},
      {120, 512, 10, polar_code_ibil::present},
      {164, 864, 10, polar_code_ibil::present},
      {500, 1024, 10, polar_code_ibil::present},
      // DCI/PBCH-style (nMax=9, no interleaving)
      {36, 108, 9, polar_code_ibil::not_present},
      {44, 96, 9, polar_code_ibil::not_present},
      {40, 216, 9, polar_code_ibil::not_present},
      {60, 432, 9, polar_code_ibil::not_present},
      {100, 256, 9, polar_code_ibil::not_present},
      {140, 288, 9, polar_code_ibil::not_present},
      {164, 8192, 9, polar_code_ibil::not_present},
  };
  int idx = 0;
  for (const auto& c : cases) {
    code.set(c.K, c.E, c.nMax, c.ibil);
    unsigned N = code.get_N();
    // Dump the code construction.
    std::vector<uint16_t> kset, fset, pcset;
    const auto& kmask = code.get_K_set();
    for (unsigned i = 0; i < N; ++i)
      if (kmask.test(i)) kset.push_back(i);
    const auto& fmask = code.get_F_set();
    for (unsigned i = 0; i < N; ++i)
      if (fmask.test(i)) fset.push_back(i);
    for (auto p : code.get_PC_set()) pcset.push_back(p);

    auto msg = random_bits(rng, c.K);
    // Input interleaving (I_IL = 1) applies to DL (DCI) only, TS 38.212 5.3.1.1.
    bool use_iil = (c.nMax == 9);
    std::vector<uint8_t> interleaved(c.K);
    if (use_iil) {
      interleaver.interleave(interleaved, msg, polar_interleaver_direction::tx);
    } else {
      interleaved = msg;
    }
    std::vector<uint8_t> allocated(N);
    alloc.allocate(allocated, interleaved, code);
    std::vector<uint8_t> encoded(N);
    enc.encode(encoded, allocated, code.get_n());
    std::vector<uint8_t> matched(c.E);
    rm.rate_match(matched, encoded, code);

    // BPSK + AWGN at 3 dB -> int8 LLRs.
    float sigma = std::pow(10.f, -3.f / 20.f);
    std::vector<log_likelihood_ratio> llrs(c.E);
    for (unsigned i = 0; i < c.E; ++i) {
      float x = (matched[i] ? -1.f : 1.f) + sigma * noise_d(rng);
      int q = (int)std::lround(2.f * x / (sigma * sigma) * 4.f);
      llrs[i] = std::max(-127, std::min(127, q));
    }
    std::vector<log_likelihood_ratio> dematched(N);
    rdm.rate_dematch(dematched, llrs, code);
    std::vector<uint8_t> dec_out(N);
    dec.decode(dec_out, dematched, code);
    std::vector<uint8_t> dec_msg_il(c.K);
    dealloc.deallocate(dec_msg_il, dec_out, code);
    std::vector<uint8_t> dec_msg(c.K);
    if (use_iil) {
      interleaver.interleave(dec_msg, dec_msg_il, polar_interleaver_direction::rx);
    } else {
      dec_msg = dec_msg_il;
    }

    std::string base = std::to_string(idx);
    write_dat("kset" + base + ".dat", kset);
    write_dat("fset" + base + ".dat", fset);
    write_dat("pcset" + base + ".dat", pcset);
    write_dat("msg" + base + ".dat", msg);
    write_dat("encoded" + base + ".dat", encoded);
    write_dat("matched" + base + ".dat", matched);
    write_dat("llrs" + base + ".dat", reinterpret_cast<const int8_t*>(llrs.data()), c.E);
    write_dat("dematched" + base + ".dat", reinterpret_cast<const int8_t*>(dematched.data()), N);
    write_dat("decoded" + base + ".dat", dec_msg);
    m.begin_case();
    m.field("k", (long long)c.K);
    m.field("e", (long long)c.E);
    m.field("n_max", (long long)c.nMax);
    m.field("ibil", (long long)(c.ibil == polar_code_ibil::present ? 1 : 0));
    m.field("n", (long long)N);
    m.field("n_pc", (long long)code.get_nPC());
    m.field("idx", (long long)idx);
    m.end_case();
    ++idx;
  }
  m.flush();
}

// ----------------------------------------------------------- short block ----

void gen_short_block() {
  start("short_block");
  manifest m("manifest.json");
  auto rng = make_rng(0x5B0C);
  short_block_encoder_impl enc;
  short_block_detector_impl det;
  std::normal_distribution<float> noise_d(0.f, 1.f);
  const std::pair<modulation_scheme, const char*> mods[] = {
      {modulation_scheme::QPSK, "qpsk"},
      {modulation_scheme::QAM16, "qam16"},
      {modulation_scheme::QAM64, "qam64"},
      {modulation_scheme::QAM256, "qam256"},
  };
  int idx = 0;
  for (unsigned k = 1; k <= 11; ++k) {
    for (auto [mod, mname] : mods) {
      unsigned qm = get_bits_per_symbol(mod);
      unsigned e;
      if (k == 1) {
        e = qm;
      } else if (k == 2) {
        e = 3 * qm;
      } else {
        e = 32 + (idx % 3) * qm; // exercise rate-matched repetition a bit
      }
      auto msg = random_bits(rng, k);
      std::vector<uint8_t> out(e);
      enc.encode(out, msg, mod);
      // Noisy LLRs for the detector at 6 dB.
      float sigma = std::pow(10.f, -6.f / 20.f);
      std::vector<log_likelihood_ratio> llrs(e);
      for (unsigned i = 0; i < e; ++i) {
        float x = (out[i] ? -1.f : 1.f) + sigma * noise_d(rng);
        int q = (int)std::lround(2.f * x / (sigma * sigma) * 4.f);
        llrs[i] = std::max(-127, std::min(127, q));
      }
      std::vector<uint8_t> detected(k);
      bool ok = det.detect(detected, llrs, mod);
      std::string base = std::to_string(idx);
      write_dat("msg" + base + ".dat", msg);
      write_dat("enc" + base + ".dat", out);
      write_dat("llrs" + base + ".dat", reinterpret_cast<const int8_t*>(llrs.data()), e);
      write_dat("det" + base + ".dat", detected);
      m.begin_case();
      m.field("k", (long long)k);
      m.field("e", (long long)e);
      m.field("mod", std::string(mname));
      m.field("qm", (long long)qm);
      m.field("detect_ok", (long long)(ok ? 1 : 0));
      m.field("idx", (long long)idx);
      m.end_case();
      ++idx;
    }
  }
  m.flush();
}

// ------------------------------------------------------ pdcch candidates ----

#include "srsran/ran/pdcch/pdcch_candidates.h"

void gen_pdcch_candidates() {
  start("pdcch_candidates");
  manifest m("manifest.json");
  auto rng = make_rng(0xCCE5);
  std::uniform_int_distribution<unsigned> rnti_d(1, 65519);
  for (unsigned nof_cces : {12u, 24u, 48u, 135u}) {
    for (unsigned al_idx = 0; al_idx != 5; ++al_idx) {
      unsigned L = 1u << al_idx;
      if (L > nof_cces) continue;
      for (unsigned nof_cand : {1u, 2u, 4u, 6u}) {
        // Common SS.
        {
          pdcch_candidates_common_ss_configuration cfg;
          cfg.al = static_cast<aggregation_level>(al_idx);
          cfg.nof_candidates = nof_cand;
          cfg.nof_cce_coreset = nof_cces;
          auto cands = pdcch_candidates_common_ss_get_lowest_cce(cfg);
          std::string lst;
          for (auto c : cands) { if (!lst.empty()) lst += ","; lst += std::to_string(c); }
          m.begin_case();
          m.field("kind", std::string("common"));
          m.field("nof_cces", (long long)nof_cces);
          m.field("al", (long long)L);
          m.field("nof_candidates", (long long)nof_cand);
          m.field("candidates", lst);
          m.end_case();
        }
        // UE SS over a few (rnti, coreset, slot) combos.
        for (int k = 0; k != 3; ++k) {
          unsigned rnti = rnti_d(rng);
          unsigned cs_id = k;
          unsigned slot = (k * 7) % 20;
          pdcch_candidates_ue_ss_configuration cfg;
          cfg.al = static_cast<aggregation_level>(al_idx);
          cfg.nof_candidates = nof_cand;
          cfg.nof_cce_coreset = nof_cces;
          cfg.cs_id = to_coreset_id(cs_id);
          cfg.rnti = to_rnti(rnti);
          cfg.slot_index = slot;
          auto cands = pdcch_candidates_ue_ss_get_lowest_cce(cfg);
          std::string lst;
          for (auto c : cands) { if (!lst.empty()) lst += ","; lst += std::to_string(c); }
          m.begin_case();
          m.field("kind", std::string("ue"));
          m.field("nof_cces", (long long)nof_cces);
          m.field("al", (long long)L);
          m.field("nof_candidates", (long long)nof_cand);
          m.field("rnti", (long long)rnti);
          m.field("coreset_id", (long long)cs_id);
          m.field("slot_index", (long long)slot);
          m.field("candidates", lst);
          m.end_case();
        }
      }
    }
  }
  m.flush();
}

// ---------------------------------------------------------------------------
// CSI report sizing + unpacking (lib/ran/csi_report): PUSCH two-part and
// PUCCH single-part reports across codebooks / quantities / RI restrictions.
#include "lib/ran/csi_report/csi_report_on_puxch_helpers.h"
#include "srsran/ran/csi_report/csi_report_on_pusch_helpers.h"
#include "srsran/ran/csi_report/csi_report_on_pucch_helpers.h"
#include "srsran/ran/csi_report/csi_report_on_puxch_utils.h"

namespace {

void dump_csi_data(manifest& m, const csi_report_data& data) {
  m.field("cri", data.cri.has_value() ? (long long)*data.cri : -1LL);
  m.field("ri", data.ri.has_value() ? (long long)data.ri->to_uint() : -1LL);
  m.field("li", data.li.has_value() ? (long long)data.li->to_uint() : -1LL);
  long long pmi2 = -1, i11 = -1, i13 = -1, i2 = -1;
  if (data.pmi.has_value()) {
    if (const auto* two = std::get_if<csi_report_pmi::two_antenna_port>(&data.pmi->type)) {
      pmi2 = two->pmi;
    } else if (const auto* four =
                   std::get_if<csi_report_pmi::typeI_single_panel_4ports_mode1>(&data.pmi->type)) {
      i11 = four->i_1_1;
      i13 = four->i_1_3.has_value() ? (long long)*four->i_1_3 : -1LL;
      i2 = four->i_2;
    }
  }
  m.field("pmi2p", pmi2);
  m.field("i11", i11);
  m.field("i13", i13);
  m.field("i2", i2);
  m.field("cqi1", data.first_tb_wideband_cqi.has_value()
                      ? (long long)data.first_tb_wideband_cqi->to_uint() : -1LL);
  m.field("cqi2", data.second_tb_wideband_cqi.has_value()
                      ? (long long)data.second_tb_wideband_cqi->to_uint() : -1LL);
}

void write_packed_bits(const std::string& name, const csi_report_packed& p) {
  std::vector<uint8_t> bits(p.size());
  for (unsigned i = 0; i != p.size(); ++i) bits[i] = p.test(i) ? 1 : 0;
  write_dat(name, bits);
}

} // namespace

void gen_csi_report() {
  start("csi_report");
  manifest m("manifest.json");
  auto rng = make_rng(0xC51);

  struct ccase { pmi_codebook_type cb; csi_report_quantities q; unsigned nres, mask; };
  std::vector<ccase> cases;
  for (pmi_codebook_type cb : {pmi_codebook_type::one, pmi_codebook_type::two,
                               pmi_codebook_type::typeI_single_panel_4ports_mode1}) {
    unsigned nports = csi_report_get_nof_csi_rs_antenna_ports(cb);
    std::vector<unsigned> masks = {(1u << nports) - 1u};
    // A restriction whose only allowed rank != 1 is internally inconsistent
    // in the reference (empty RI field unpacks to rank 1 while the part-2
    // map is keyed by the allowed rank) -- never configured; skip those.
    if (nports == 2) { masks.push_back(0b01); }
    if (nports == 4) { masks.push_back(0b0011); masks.push_back(0b1010); masks.push_back(0b0001); }
    for (csi_report_quantities q : {csi_report_quantities::cri_ri_pmi_cqi,
                                    csi_report_quantities::cri_ri_cqi,
                                    csi_report_quantities::cri_ri_li_pmi_cqi})
      for (unsigned nres : {1u, 3u, 4u})
        for (unsigned mask : masks) cases.push_back({cb, q, nres, mask});
  }

  int idx = 0;
  for (const auto& c : cases) {
    unsigned nports = csi_report_get_nof_csi_rs_antenna_ports(c.cb);
    csi_report_configuration cfg;
    cfg.nof_csi_rs_resources = c.nres;
    cfg.pmi_codebook = c.cb;
    cfg.ri_restriction = ri_restriction_type(nports);
    for (unsigned i = 0; i != nports; ++i)
      if (c.mask & (1u << i)) cfg.ri_restriction.set(i);
    cfg.quantities = c.q;

    csi_report_size psz = get_csi_report_pusch_size(cfg);
    csi_report_size usz = get_csi_report_pucch_size(cfg);
    ri_li_cqi_cri_sizes f1 =
        get_ri_li_cqi_cri_sizes(c.cb, cfg.ri_restriction, 1U, c.nres);
    unsigned nof_allowed = cfg.ri_restriction.count();

    // Flatten part-2 correspondence (at most 1 entry / 1 parameter here).
    long long corr_off = -1, corr_w = -1;
    std::string corr_map;
    if (!psz.part2_correspondence.entries.empty()) {
      const auto& e = psz.part2_correspondence.entries.front();
      corr_off = e.parameters.front().offset;
      corr_w = e.parameters.front().width;
      for (unsigned v : e.map) {
        if (!corr_map.empty()) corr_map += ",";
        corr_map += std::to_string(v);
      }
    }

    for (int draw = 0; draw != 3; ++draw) {
      // PUSCH two-part payload: random part 1 with a valid RI field value.
      csi_report_packed p1(psz.part1_size.value());
      do {
        for (unsigned i = 0; i != p1.size(); ++i) p1.set(i, (rng() & 1) != 0);
      } while (f1.ri != 0 && p1.extract(f1.cri, f1.ri) >= nof_allowed);
      unsigned p2_bits = 0;
      if (corr_off >= 0) {
        unsigned v = (corr_w > 0) ? p1.extract((unsigned)corr_off, (unsigned)corr_w) : 0;
        p2_bits = psz.part2_correspondence.entries.front().map[v];
      }
      csi_report_packed p2(p2_bits);
      for (unsigned i = 0; i != p2.size(); ++i) p2.set(i, (rng() & 1) != 0);
      if (!validate_pusch_csi_payload(p1, p2, cfg)) {
        fprintf(stderr, "csi_report reject: idx=%d cb=%d q=%d nres=%u mask=%u p1=%u p2=%u\n", idx, (int)c.cb, (int)c.q, c.nres, c.mask, (unsigned)p1.size(), (unsigned)p2.size());
        std::abort();
      }
      csi_report_data data = csi_report_unpack_pusch(p1, p2, cfg);

      // PUCCH single-part payload (same config).
      csi_report_packed up(usz.part1_size.value());
      do {
        for (unsigned i = 0; i != up.size(); ++i) up.set(i, (rng() & 1) != 0);
      } while (f1.ri != 0 && up.extract(f1.cri, f1.ri) >= nof_allowed);
      csi_report_data udata = csi_report_unpack_pucch(up, cfg);

      std::string base = std::to_string(idx);
      write_packed_bits("p1_" + base + ".dat", p1);
      write_packed_bits("p2_" + base + ".dat", p2);
      write_packed_bits("pu_" + base + ".dat", up);
      m.begin_case();
      m.field("codebook", (long long)c.cb);
      m.field("quantities", (long long)c.q);
      m.field("nof_resources", (long long)c.nres);
      m.field("ri_mask", (long long)c.mask);
      m.field("nof_ports", (long long)nports);
      m.field("part1_size", (long long)psz.part1_size.value());
      m.field("part2_min", (long long)psz.part2_min_size.value());
      m.field("part2_max", (long long)psz.part2_max_size.value());
      m.field("pucch_size", (long long)usz.part1_size.value());
      m.field("corr_offset", corr_off);
      m.field("corr_width", corr_w);
      m.field("corr_map", corr_map);
      m.field("part2_size", (long long)p2_bits);
      dump_csi_data(m, data);
      m.field("u_cri", udata.cri.has_value() ? (long long)*udata.cri : -1LL);
      m.field("u_ri", udata.ri.has_value() ? (long long)udata.ri->to_uint() : -1LL);
      m.field("u_li", udata.li.has_value() ? (long long)udata.li->to_uint() : -1LL);
      long long u_pmi2 = -1, u_i11 = -1, u_i13 = -1, u_i2 = -1;
      if (udata.pmi.has_value()) {
        if (const auto* two = std::get_if<csi_report_pmi::two_antenna_port>(&udata.pmi->type)) {
          u_pmi2 = two->pmi;
        } else if (const auto* four =
                       std::get_if<csi_report_pmi::typeI_single_panel_4ports_mode1>(&udata.pmi->type)) {
          u_i11 = four->i_1_1;
          u_i13 = four->i_1_3.has_value() ? (long long)*four->i_1_3 : -1LL;
          u_i2 = four->i_2;
        }
      }
      m.field("u_pmi2p", u_pmi2);
      m.field("u_i11", u_i11);
      m.field("u_i13", u_i13);
      m.field("u_i2", u_i2);
      m.field("u_cqi1", udata.first_tb_wideband_cqi.has_value()
                            ? (long long)udata.first_tb_wideband_cqi->to_uint() : -1LL);
      m.field("u_cqi2", udata.second_tb_wideband_cqi.has_value()
                            ? (long long)udata.second_tb_wideband_cqi->to_uint() : -1LL);
      m.field("idx", (long long)idx);
      m.end_case();
      ++idx;
    }
  }
  m.flush();
}
