// gamma_client.h — header-only C++ client for the gamma-tpu serving
// surface (the second-language SDK; the reference ships a Go binding,
// go/gamma/gamma.go:20-132 over cgo + flatbuffers — here the contract is
// the 5-byte request / 8-byte response frame of gamma_tpu/server.py
// carrying the GWIR wire format of gamma_tpu/idl/wire.py).
//
// Covers the FULL op set: Init, Close, CreateTable, AddOrUpdateDocs,
// DeleteDoc, Search, GetDoc, BuildIndex, Flush, Status, Dump, Load,
// DelDocByQuery.
//
// JSON headers are plain strings (compose them with your JSON library of
// choice); vectors travel as raw little-endian f32 blobs referenced from
// the JSON by {"$blob": i, "dtype": "float32", "shape": [...]}.
//
// Usage:
//   gammatpu::GammaClient cli("/tmp/gamma.sock");       // or (host, port)
//   cli.Init("{\"path\":\"/tmp/engine\", ...}");
//   cli.CreateTable(table_json);
//   cli.AddOrUpdateDocs(docs_json, blobs, &result);
//   cli.Search(request_json, {query_blob}, &response_json);

#ifndef GAMMA_TPU_NATIVE_GAMMA_CLIENT_H_
#define GAMMA_TPU_NATIVE_GAMMA_CLIENT_H_

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace gammatpu {

constexpr uint32_t kMagic = 0x47574952;  // 'GWIR'
constexpr uint8_t kVersion = 1;

enum MsgType : uint8_t {
  MSG_CONFIG = 1,
  MSG_TABLE = 2,
  MSG_DOC = 3,
  MSG_DOCS = 4,
  MSG_REQUEST = 5,
  MSG_RESPONSE = 6,
  MSG_STATUS = 7,
};

enum Op : uint8_t {
  OP_INIT = 1,
  OP_CLOSE = 2,
  OP_CREATE_TABLE = 3,
  OP_ADD_OR_UPDATE_DOCS = 4,
  OP_DELETE_DOC = 5,
  OP_SEARCH = 6,
  OP_GET_DOC = 7,
  OP_BUILD_INDEX = 8,
  OP_FLUSH = 9,
  OP_STATUS = 10,
  OP_DUMP = 11,
  OP_LOAD = 12,
  OP_DEL_BY_QUERY = 13,
};

inline void PutU32(std::string* out, uint32_t v) {
  char b[4];
  std::memcpy(b, &v, 4);  // x86/arm64 little-endian
  out->append(b, 4);
}

// GWIR message: 12-byte header | JSON | u32 n_blobs | {u32 len | bytes}*
inline std::string WirePack(uint8_t msg_type, const std::string& json,
                            const std::vector<std::string>& blobs = {}) {
  std::string out;
  PutU32(&out, kMagic);
  out.push_back(static_cast<char>(kVersion));
  out.push_back(static_cast<char>(msg_type));
  out.push_back(0);
  out.push_back(0);
  PutU32(&out, static_cast<uint32_t>(json.size()));
  out += json;
  PutU32(&out, static_cast<uint32_t>(blobs.size()));
  for (const auto& b : blobs) {
    PutU32(&out, static_cast<uint32_t>(b.size()));
    out += b;
  }
  return out;
}

inline std::string F32Blob(const float* data, size_t n) {
  return std::string(reinterpret_cast<const char*>(data),
                     n * sizeof(float));
}

inline std::string F32Blob(const std::vector<float>& v) {
  return F32Blob(v.data(), v.size());
}

class GammaClient {
 public:
  // unix-domain socket
  explicit GammaClient(const std::string& socket_path) {
    fd_ = ::socket(AF_UNIX, SOCK_STREAM, 0);
    sockaddr_un addr{};
    addr.sun_family = AF_UNIX;
    std::snprintf(addr.sun_path, sizeof(addr.sun_path), "%s",
                  socket_path.c_str());
    ok_ = fd_ >= 0 &&
          ::connect(fd_, reinterpret_cast<sockaddr*>(&addr),
                    sizeof(addr)) == 0;
  }

  // tcp
  GammaClient(const std::string& host, int port) {
    fd_ = ::socket(AF_INET, SOCK_STREAM, 0);
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(static_cast<uint16_t>(port));
    ::inet_pton(AF_INET, host.c_str(), &addr.sin_addr);
    ok_ = fd_ >= 0 &&
          ::connect(fd_, reinterpret_cast<sockaddr*>(&addr),
                    sizeof(addr)) == 0;
  }

  ~GammaClient() {
    if (fd_ >= 0) ::close(fd_);
  }
  GammaClient(const GammaClient&) = delete;
  GammaClient& operator=(const GammaClient&) = delete;

  bool connected() const { return ok_; }

  // frame: u8 opcode | u32 len | payload → i32 status | u32 len | payload
  // Returns the server status (0 = OK), or -100 on transport error.
  int Call(uint8_t op, const std::string& payload, std::string* out) {
    if (!ok_) return -100;
    std::string req;
    req.push_back(static_cast<char>(op));
    PutU32(&req, static_cast<uint32_t>(payload.size()));
    req += payload;
    if (!SendAll(req.data(), req.size())) return -100;
    char hdr[8];
    if (!RecvAll(hdr, 8)) return -100;
    int32_t status;
    uint32_t plen;
    std::memcpy(&status, hdr, 4);
    std::memcpy(&plen, hdr + 4, 4);
    out->resize(plen);
    if (plen && !RecvAll(&(*out)[0], plen)) return -100;
    return status;
  }

  // ---- full op surface ----

  int Init(const std::string& config_json) {
    std::string out;
    return Call(OP_INIT, WirePack(MSG_CONFIG, config_json), &out);
  }

  int CreateTable(const std::string& table_json) {
    std::string out;
    return Call(OP_CREATE_TABLE, WirePack(MSG_TABLE, table_json), &out);
  }

  // docs_json: {"docs":[{key, fields, vectors:{f:{"$blob":i,...}}}, ...]}
  // result: per-doc status codes as a GWIR status payload
  int AddOrUpdateDocs(const std::string& docs_json,
                      const std::vector<std::string>& blobs,
                      std::string* result) {
    return Call(OP_ADD_OR_UPDATE_DOCS, WirePack(MSG_DOCS, docs_json, blobs),
                result);
  }

  int DeleteDoc(const std::string& key) {
    std::string out;
    return Call(OP_DELETE_DOC, key, &out);
  }

  // request_json: the Request header (topn, vec_fields with $blob refs,
  // range_filters, term_filters, ...); response_json gets the Response.
  int Search(const std::string& request_json,
             const std::vector<std::string>& blobs,
             std::string* response_json) {
    return Call(OP_SEARCH, WirePack(MSG_REQUEST, request_json, blobs),
                response_json);
  }

  int GetDoc(const std::string& key, std::string* doc_json) {
    return Call(OP_GET_DOC, key, doc_json);
  }

  int BuildIndex() {
    std::string out;
    return Call(OP_BUILD_INDEX, "", &out);
  }

  int Flush() {
    std::string out;
    return Call(OP_FLUSH, "", &out);
  }

  int Status(std::string* status_json) {
    return Call(OP_STATUS, "", status_json);
  }

  int Dump() {
    std::string out;
    return Call(OP_DUMP, "", &out);
  }

  // returns 0 on success (restore state inspectable via Status)
  int Load() {
    std::string out;
    return Call(OP_LOAD, "", &out);
  }

  // deletes every doc matching the request's range/term filters;
  // returns the deleted count (>= 0) or a negative error
  int DelDocByQuery(const std::string& request_json) {
    std::string out;
    return Call(OP_DEL_BY_QUERY, WirePack(MSG_REQUEST, request_json, {}),
                &out);
  }

  int CloseEngine() {
    std::string out;
    return Call(OP_CLOSE, "", &out);
  }

 private:
  bool SendAll(const char* p, size_t n) {
    while (n) {
      ssize_t w = ::write(fd_, p, n);
      if (w <= 0) return false;
      p += w;
      n -= static_cast<size_t>(w);
    }
    return true;
  }
  bool RecvAll(char* p, size_t n) {
    while (n) {
      ssize_t r = ::read(fd_, p, n);
      if (r <= 0) return false;
      p += r;
      n -= static_cast<size_t>(r);
    }
    return true;
  }
  int fd_ = -1;
  bool ok_ = false;
};

}  // namespace gammatpu

#endif  // GAMMA_TPU_NATIVE_GAMMA_CLIENT_H_
