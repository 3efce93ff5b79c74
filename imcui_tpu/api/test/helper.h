// C++ client helpers for the imcui_tpu HTTP API.
// Reference contract: imcui/api/test/helper.h:1-405 — APIParams mirroring
// the ImagesInput schema, base64 codec, JSON encode, response decode.
// Dependency-free rebuild: raw POSIX sockets for HTTP, hand-rolled base64
// and a minimal JSON scanner instead of libcurl/jsoncpp/libb64/OpenCV.
#pragma once

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

// Mirrors the pydantic ImagesInput (imcui_tpu/api/__init__.py, reference
// imcui/api/__init__.py:14-25).
struct APIParams {
  std::vector<std::string> data;          // base64 images
  std::vector<int> max_keypoints;
  std::vector<std::string> timestamps;
  bool grayscale = false;
  int feature_type = 0;
  std::vector<double> rotates;
  std::vector<double> scales;
  bool binarize = true;
};

struct KeyPoint {
  float x, y;
};

struct KeyPointResults {
  std::vector<std::vector<KeyPoint>> keypoints;  // per image
};

// ---------------------------------------------------------------------------
// base64
// ---------------------------------------------------------------------------

inline std::string base64_encode(const std::string& in) {
  static const char tbl[] =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  std::string out;
  out.reserve((in.size() + 2) / 3 * 4);
  size_t i = 0;
  while (i + 2 < in.size()) {
    unsigned v = (unsigned char)in[i] << 16 | (unsigned char)in[i + 1] << 8 |
                 (unsigned char)in[i + 2];
    out += tbl[(v >> 18) & 63];
    out += tbl[(v >> 12) & 63];
    out += tbl[(v >> 6) & 63];
    out += tbl[v & 63];
    i += 3;
  }
  if (i + 1 == in.size()) {
    unsigned v = (unsigned char)in[i] << 16;
    out += tbl[(v >> 18) & 63];
    out += tbl[(v >> 12) & 63];
    out += "==";
  } else if (i + 2 == in.size()) {
    unsigned v = (unsigned char)in[i] << 16 | (unsigned char)in[i + 1] << 8;
    out += tbl[(v >> 18) & 63];
    out += tbl[(v >> 12) & 63];
    out += tbl[(v >> 6) & 63];
    out += '=';
  }
  return out;
}

inline std::string image_to_base64(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot read " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return base64_encode(ss.str());
}

// ---------------------------------------------------------------------------
// JSON encode (reference parity: helper.h paramsToJson)
// ---------------------------------------------------------------------------

inline std::string paramsToJson(const APIParams& p) {
  std::ostringstream js;
  js << "{\"data\":[";
  for (size_t i = 0; i < p.data.size(); ++i)
    js << (i ? "," : "") << "\"" << p.data[i] << "\"";
  js << "],\"max_keypoints\":[";
  for (size_t i = 0; i < p.max_keypoints.size(); ++i)
    js << (i ? "," : "") << p.max_keypoints[i];
  js << "],\"timestamps\":[";
  for (size_t i = 0; i < p.timestamps.size(); ++i)
    js << (i ? "," : "") << "\"" << p.timestamps[i] << "\"";
  js << "],\"grayscale\":" << (p.grayscale ? "true" : "false")
     << ",\"feature_type\":" << p.feature_type << ",\"rotates\":[";
  for (size_t i = 0; i < p.rotates.size(); ++i)
    js << (i ? "," : "") << p.rotates[i];
  js << "],\"scales\":[";
  for (size_t i = 0; i < p.scales.size(); ++i)
    js << (i ? "," : "") << p.scales[i];
  js << "],\"binarize\":" << (p.binarize ? "true" : "false") << "}";
  return js.str();
}

// ---------------------------------------------------------------------------
// minimal HTTP POST over a plain socket
// ---------------------------------------------------------------------------

inline std::string http_post(const std::string& host, int port,
                             const std::string& path,
                             const std::string& body) {
  struct addrinfo hints {}, *res;
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(host.c_str(), std::to_string(port).c_str(), &hints,
                  &res) != 0)
    throw std::runtime_error("resolve failed: " + host);
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
    freeaddrinfo(res);
    throw std::runtime_error("connect failed");
  }
  freeaddrinfo(res);

  std::ostringstream req;
  req << "POST " << path << " HTTP/1.1\r\nHost: " << host
      << "\r\nContent-Type: application/json\r\nContent-Length: "
      << body.size() << "\r\nConnection: close\r\n\r\n"
      << body;
  const std::string s = req.str();
  size_t sent = 0;
  while (sent < s.size()) {
    ssize_t n = ::send(fd, s.data() + sent, s.size() - sent, 0);
    if (n <= 0) throw std::runtime_error("send failed");
    sent += (size_t)n;
  }
  std::string resp;
  char buf[65536];
  ssize_t n;
  while ((n = ::recv(fd, buf, sizeof(buf), 0)) > 0) resp.append(buf, n);
  ::close(fd);
  size_t hdr_end = resp.find("\r\n\r\n");
  if (hdr_end == std::string::npos)
    throw std::runtime_error("bad HTTP response");
  return resp.substr(hdr_end + 4);
}

// ---------------------------------------------------------------------------
// response decode: pull "keypoints" arrays out of the JSON
// (reference parity: helper.h decode_response → KeyPointResults)
// ---------------------------------------------------------------------------

inline KeyPointResults decode_response(const std::string& json) {
  KeyPointResults out;
  size_t pos = 0;
  while ((pos = json.find("\"keypoints\"", pos)) != std::string::npos) {
    size_t start = json.find('[', pos);
    if (start == std::string::npos) break;
    // scan the balanced 2-level array [[x, y], ...]
    int depth = 0;
    size_t i = start;
    std::vector<KeyPoint> kpts;
    std::string num;
    float vals[2];
    int vi = 0;
    for (; i < json.size(); ++i) {
      char c = json[i];
      if (c == '[') {
        ++depth;
        vi = 0;
        num.clear();
      } else if (c == ',' || c == ']') {
        if (!num.empty() && depth == 2 && vi < 2) {
          vals[vi++] = std::stof(num);
          num.clear();
        }
        if (c == ']') {
          if (depth == 2 && vi == 2) kpts.push_back({vals[0], vals[1]});
          if (--depth == 0) break;
        }
      } else if ((c >= '0' && c <= '9') || c == '.' || c == '-' ||
                 c == 'e' || c == 'E' || c == '+') {
        num += c;
      }
    }
    out.keypoints.push_back(std::move(kpts));
    pos = i;
  }
  return out;
}
