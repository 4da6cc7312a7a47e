// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

/// @notice Accept-everything verifier for contract integration tests
///         (the reference's MockVerifier.sol used by
///         contract-tests/tests/spectre.rs:34-84).
contract MockVerifier {
    fallback() external {
        assembly {
            mstore(0x00, 1)
            return(0x00, 0x20)
        }
    }
}
