// gamma_client_demo — end-to-end exercise of the full C++ SDK surface
// (native/gamma_client.h) against a running gamma_tpu server.
//
// The reference ships a Go binding (go/gamma/gamma.go:20-132); this is
// the second-language SDK for gamma-tpu, speaking the GWIR wire format
// over the frame protocol of gamma_tpu/server.py.
//
// Flow: Init → CreateTable → AddOrUpdateDocs → Flush → Status →
// brute Search (self-hit rank 1) → term-filtered Search → range-filtered
// Search → GetDoc → DeleteDoc (+ verify gone) → DelDocByQuery →
// BuildIndex → Dump → Load (restore count) → Close.
//
// Build: g++ -O2 -std=c++17 -o gamma_client_demo gamma_client.cc
// Run:   ./gamma_client_demo SOCKET ENGINE_DIR

#include <cstdio>
#include <string>
#include <vector>

#include "gamma_client.h"

using gammatpu::F32Blob;
using gammatpu::GammaClient;

namespace {

bool Contains(const std::string& s, const std::string& what) {
  return s.find(what) != std::string::npos;
}

std::string SearchHeader(int dim, const std::string& extra_filters,
                         bool brute) {
  return std::string("{\"topn\":5,\"req_num\":1,\"brute_force_search\":") +
         (brute ? "true" : "false") +
         ",\"multi_vector_rank\":0,\"l2_sqrt\":false,"
         "\"online_log_level\":\"\",\"fields\":[],\"retrieval_params\":{},"
         "\"vec_fields\":[{\"name\":\"emb\",\"value\":{\"$blob\":0,"
         "\"dtype\":\"float32\",\"shape\":[1," + std::to_string(dim) +
         "]},\"min_score\":null,\"max_score\":null,\"boost\":1.0,"
         "\"has_boost\":false}]," + extra_filters + "}";
}

#define CHECK(cond, msg)                      \
  do {                                        \
    if (!(cond)) {                            \
      std::fprintf(stderr, "FAIL: %s\n", msg); \
      return 1;                               \
    }                                         \
  } while (0)

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s SOCKET ENGINE_DIR\n", argv[0]);
    return 2;
  }
  const std::string sock = argv[1];
  const std::string dir = argv[2];
  const int N = 400, D = 16;

  GammaClient cli(sock);
  CHECK(cli.connected(), "connect");
  std::string out;

  char cfg[512];
  std::snprintf(cfg, sizeof(cfg),
                "{\"path\":\"%s\",\"log_dir\":\"\",\"max_doc_size\":100000,"
                "\"max_concurrent\":4,\"native_persistence\":false}",
                dir.c_str());
  CHECK(cli.Init(cfg) == 0, "init");

  char table[640];
  std::snprintf(
      table, sizeof(table),
      "{\"name\":\"t\",\"fields\":[{\"name\":\"price\",\"data_type\":2,"
      "\"is_index\":true},{\"name\":\"tag\",\"data_type\":4,"
      "\"is_index\":true}],\"vectors\":[{\"name\":\"emb\","
      "\"dimension\":%d,\"store_type\":\"MemoryOnly\",\"store_param\":{},"
      "\"data_type\":2,\"is_index\":true}],\"indexing_size\":100000,"
      "\"retrieval_types\":[\"IVFPQ\"],\"retrieval_params\":"
      "[{\"ncentroids\":16,\"nsubvector\":4}]}",
      D);
  CHECK(cli.CreateTable(table) == 0, "create_table");

  // deterministic LCG vectors, one f32 blob per doc
  uint32_t seed = 12345;
  auto next_f = [&seed]() {
    seed = seed * 1664525u + 1013904223u;
    return static_cast<float>(seed >> 8) / static_cast<float>(1 << 24);
  };
  std::vector<std::vector<float>> vecs(N, std::vector<float>(D));
  for (auto& v : vecs)
    for (auto& x : v) x = next_f();

  std::string docs_hdr = "{\"docs\":[";
  std::vector<std::string> blobs;
  for (int i = 0; i < N; i++) {
    char one[320];
    std::snprintf(one, sizeof(one),
                  "%s{\"key\":\"k%d\",\"fields\":{\"price\":%d,"
                  "\"tag\":\"t%d\"},\"vectors\":{\"emb\":{\"$blob\":%d,"
                  "\"dtype\":\"float32\",\"shape\":[%d]}}}",
                  i ? "," : "", i, i % 100, i % 4, i, D);
    docs_hdr += one;
    blobs.push_back(F32Blob(vecs[i]));
  }
  docs_hdr += "]}";
  CHECK(cli.AddOrUpdateDocs(docs_hdr, blobs, &out) == 0, "add_docs");
  CHECK(cli.Flush() == 0, "flush");

  CHECK(cli.Status(&out) == 0, "status");
  char want[64];
  std::snprintf(want, sizeof(want), "\"doc_count\":%d", N);
  CHECK(Contains(out, want), "status doc_count");

  // 1. brute search: doc 7's own vector must rank first
  const std::string no_filters =
      "\"range_filters\":[],\"term_filters\":[]";
  CHECK(cli.Search(SearchHeader(D, no_filters, true), {F32Blob(vecs[7])},
                   &out) == 0, "search");
  size_t first = out.find("\"items\":[");
  CHECK(first != std::string::npos, "items array");
  CHECK(out.find("\"key\":", first) == out.find("\"key\":\"k7\"", first),
        "self-hit k7 rank 1");

  // 2. term-filtered search: tag == t2 admits only docid % 4 == 2
  const std::string term_f =
      "\"range_filters\":[],\"term_filters\":[{\"field\":\"tag\","
      "\"value\":\"t2\",\"is_union\":1}]";
  CHECK(cli.Search(SearchHeader(D, term_f, true), {F32Blob(vecs[7])},
                   &out) == 0, "term search");
  CHECK(!Contains(out, "\"key\":\"k7\""), "term filter excludes k7");
  CHECK(Contains(out, "\"key\":\"k"), "term filter returns hits");

  // 3. range-filtered search: price in [7, 7] → keys k7, k107, k207, k307
  const std::string range_f =
      "\"range_filters\":[{\"field\":\"price\",\"lower_value\":7,"
      "\"upper_value\":7,\"include_lower\":true,\"include_upper\":true}],"
      "\"term_filters\":[]";
  CHECK(cli.Search(SearchHeader(D, range_f, true), {F32Blob(vecs[7])},
                   &out) == 0, "range search");
  CHECK(Contains(out, "\"key\":\"k7\""), "range filter admits k7");
  CHECK(!Contains(out, "\"key\":\"k8\""), "range filter excludes k8");

  // 4. GetDoc round-trip
  CHECK(cli.GetDoc("k42", &out) == 0, "get_doc");
  CHECK(Contains(out, "\"key\":\"k42\""), "get_doc payload");

  // 5. DeleteDoc + verify gone from results
  CHECK(cli.DeleteDoc("k7") == 0, "delete");
  CHECK(cli.Search(SearchHeader(D, no_filters, true), {F32Blob(vecs[7])},
                   &out) == 0, "search after delete");
  CHECK(!Contains(out, "\"key\":\"k7\""), "k7 gone after delete");

  // 6. DelDocByQuery: price == 9 deletes 4 docs
  const std::string delq =
      "{\"topn\":1,\"req_num\":0,\"brute_force_search\":false,"
      "\"multi_vector_rank\":0,\"l2_sqrt\":false,\"online_log_level\":\"\","
      "\"fields\":[],\"retrieval_params\":{},\"vec_fields\":[],"
      "\"range_filters\":[{\"field\":\"price\",\"lower_value\":9,"
      "\"upper_value\":9,\"include_lower\":true,\"include_upper\":true}],"
      "\"term_filters\":[]}";
  int deleted = cli.DelDocByQuery(delq);
  CHECK(deleted == 4, "del_doc_by_query count");

  // 7. BuildIndex + Dump + Load: the restored engine still excludes the
  // deleted docs and still answers searches
  CHECK(cli.BuildIndex() == 0, "build_index");
  CHECK(cli.Flush() == 0, "flush before dump");
  CHECK(cli.Dump() == 0, "dump");
  CHECK(cli.Load() == 0, "load");
  CHECK(cli.Search(SearchHeader(D, no_filters, true), {F32Blob(vecs[7])},
                   &out) == 0, "search after load");
  CHECK(!Contains(out, "\"key\":\"k7\""), "delete survives dump/load");
  CHECK(Contains(out, "\"key\":\"k"), "restored search returns hits");
  CHECK(cli.GetDoc("k42", &out) == 0, "get_doc after load");

  CHECK(cli.CloseEngine() == 0, "close");
  std::printf("gamma_client: OK (N=%d, full surface: search/filters/"
              "get/delete/delq/dump/load)\n", N);
  return 0;
}
