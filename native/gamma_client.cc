// gamma_client — a non-Python client for the gamma-tpu serving surface.
//
// Proves the language-neutral contract the Go SDK plays for the reference
// (reference: go/gamma/gamma.go over cgo + flatbuffers; here: the 5-byte
// request / 8-byte response frame of gamma_tpu/server.py carrying the
// GWIR wire format of gamma_tpu/idl/wire.py).
//
// Flow exercised: Init → CreateTable → AddOrUpdateDocs (vectors as raw
// little-endian f32 blobs) → Flush → Status → brute-force Search →
// verify the self-hit comes back first.
//
// Build: g++ -O2 -std=c++17 -o gamma_client_demo gamma_client.cc
// Run:   ./gamma_client_demo /path/to/server.sock /tmp/engine_dir

#include <arpa/inet.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x47574952;  // 'GWIR'
constexpr uint8_t kVersion = 1;

enum MsgType : uint8_t {
  MSG_CONFIG = 1,
  MSG_TABLE = 2,
  MSG_DOCS = 4,
  MSG_REQUEST = 5,
  MSG_RESPONSE = 6,
  MSG_STATUS = 7,
};

enum Op : uint8_t {
  OP_INIT = 1,
  OP_CREATE_TABLE = 3,
  OP_ADD_OR_UPDATE_DOCS = 4,
  OP_SEARCH = 6,
  OP_FLUSH = 9,
  OP_STATUS = 10,
};

void put_u32(std::string* out, uint32_t v) {
  char b[4];
  memcpy(b, &v, 4);  // x86/arm64 little-endian
  out->append(b, 4);
}

// GWIR message: 12-byte header | JSON | u32 n_blobs | {u32 len | bytes}*
std::string wire_pack(uint8_t msg_type, const std::string& header_json,
                      const std::vector<std::string>& blobs) {
  std::string out;
  put_u32(&out, kMagic);
  out.push_back(static_cast<char>(kVersion));
  out.push_back(static_cast<char>(msg_type));
  out.push_back(0);
  out.push_back(0);
  put_u32(&out, header_json.size());
  out += header_json;
  put_u32(&out, blobs.size());
  for (const auto& b : blobs) {
    put_u32(&out, b.size());
    out += b;
  }
  return out;
}

class Client {
 public:
  explicit Client(const std::string& socket_path) {
    fd_ = socket(AF_UNIX, SOCK_STREAM, 0);
    sockaddr_un addr{};
    addr.sun_family = AF_UNIX;
    snprintf(addr.sun_path, sizeof(addr.sun_path), "%s",
             socket_path.c_str());
    if (connect(fd_, reinterpret_cast<sockaddr*>(&addr), sizeof(addr))) {
      perror("connect");
      exit(2);
    }
  }
  ~Client() { close(fd_); }

  // frame: u8 opcode | u32 len | payload  →  i32 status | u32 len | payload
  int call(uint8_t op, const std::string& payload, std::string* out) {
    std::string req;
    req.push_back(static_cast<char>(op));
    put_u32(&req, payload.size());
    req += payload;
    send_all(req.data(), req.size());
    char hdr[8];
    recv_all(hdr, 8);
    int32_t status;
    uint32_t plen;
    memcpy(&status, hdr, 4);
    memcpy(&plen, hdr + 4, 4);
    out->resize(plen);
    if (plen) recv_all(&(*out)[0], plen);
    return status;
  }

 private:
  void send_all(const char* p, size_t n) {
    while (n) {
      ssize_t w = write(fd_, p, n);
      if (w <= 0) { perror("write"); exit(2); }
      p += w;
      n -= static_cast<size_t>(w);
    }
  }
  void recv_all(char* p, size_t n) {
    while (n) {
      ssize_t r = read(fd_, p, n);
      if (r <= 0) { perror("read"); exit(2); }
      p += r;
      n -= static_cast<size_t>(r);
    }
  }
  int fd_;
};

std::string f32_blob(const std::vector<float>& v) {
  return std::string(reinterpret_cast<const char*>(v.data()),
                     v.size() * sizeof(float));
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s SOCKET ENGINE_DIR\n", argv[0]);
    return 2;
  }
  const std::string sock = argv[1];
  const std::string dir = argv[2];
  const int N = 400, D = 16;

  Client cli(sock);
  std::string out;

  // Init (MSG_CONFIG header == EngineConfig fields, no extras)
  char cfg[512];
  snprintf(cfg, sizeof(cfg),
           "{\"path\":\"%s\",\"log_dir\":\"\",\"max_doc_size\":100000,"
           "\"max_concurrent\":4,\"native_persistence\":false}",
           dir.c_str());
  if (cli.call(OP_INIT, wire_pack(MSG_CONFIG, cfg, {}), &out) != 0) {
    fprintf(stderr, "init failed\n");
    return 1;
  }

  // CreateTable
  char table[512];
  snprintf(table, sizeof(table),
           "{\"name\":\"t\",\"fields\":[{\"name\":\"price\",\"data_type\":2,"
           "\"is_index\":true}],\"vectors\":[{\"name\":\"emb\","
           "\"dimension\":%d,\"store_type\":\"MemoryOnly\",\"store_param\":{},"
           "\"data_type\":2,\"is_index\":true}],\"indexing_size\":100000,"
           "\"retrieval_types\":[\"IVFPQ\"],\"retrieval_params\":"
           "[{\"ncentroids\":16,\"nsubvector\":4}]}",
           D);
  if (cli.call(OP_CREATE_TABLE, wire_pack(MSG_TABLE, table, {}), &out)) {
    fprintf(stderr, "create_table failed\n");
    return 1;
  }

  // Docs: deterministic LCG vectors, one f32 blob per doc
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
    char one[256];
    snprintf(one, sizeof(one),
             "%s{\"key\":\"k%d\",\"fields\":{\"price\":%d},"
             "\"vectors\":{\"emb\":{\"$blob\":%d,\"dtype\":\"float32\","
             "\"shape\":[%d]}}}",
             i ? "," : "", i, i % 100, i, D);
    docs_hdr += one;
    blobs.push_back(f32_blob(vecs[i]));
  }
  docs_hdr += "]}";
  if (cli.call(OP_ADD_OR_UPDATE_DOCS, wire_pack(MSG_DOCS, docs_hdr, blobs),
               &out) != 0) {
    fprintf(stderr, "add_docs failed\n");
    return 1;
  }
  cli.call(OP_FLUSH, "", &out);

  // Status: doc_count must round-trip
  if (cli.call(OP_STATUS, "", &out) != 0) {
    fprintf(stderr, "status failed\n");
    return 1;
  }
  char want[64];
  snprintf(want, sizeof(want), "\"doc_count\":%d", N);
  if (out.find(want) == std::string::npos) {
    fprintf(stderr, "status missing %s\n", want);
    return 1;
  }

  // Brute-force search for doc 7's own vector: self-hit must rank first
  std::string req_hdr =
      "{\"topn\":5,\"req_num\":1,\"brute_force_search\":true,"
      "\"multi_vector_rank\":0,\"l2_sqrt\":false,\"online_log_level\":\"\","
      "\"fields\":[],\"retrieval_params\":{},\"vec_fields\":[{"
      "\"name\":\"emb\",\"value\":{\"$blob\":0,\"dtype\":\"float32\","
      "\"shape\":[1," + std::to_string(D) + "]},\"min_score\":null,"
      "\"max_score\":null,\"boost\":1.0,\"has_boost\":false}],"
      "\"range_filters\":[],\"term_filters\":[]}";
  if (cli.call(OP_SEARCH, wire_pack(MSG_REQUEST, req_hdr, {f32_blob(vecs[7])}),
               &out) != 0) {
    fprintf(stderr, "search failed\n");
    return 1;
  }
  size_t k7 = out.find("\"key\":\"k7\"");
  if (k7 == std::string::npos) {
    fprintf(stderr, "self-hit k7 missing from response\n");
    return 1;
  }
  // first item in the items array == best hit
  size_t first = out.find("\"items\":[");
  if (first == std::string::npos || out.find("\"key\":", first) !=
      out.find("\"key\":\"k7\"", first)) {
    fprintf(stderr, "self-hit k7 is not rank 1\n");
    return 1;
  }
  printf("gamma_client: OK (N=%d, self-hit verified)\n", N);
  return 0;
}
